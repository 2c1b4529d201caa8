#!/usr/bin/env python3
"""Static census of cross-engine round-tie exposure (round-19, judge item 3).

Walks every `round(` / `Fns.q6(` / `Fns.q9(` call in src/main/scala
(SparkEntry.scala's SQL strings are the ORACLE MIRRORS of these sites and
convert in lockstep — they are not independent sites), extracts the full
balanced-paren argument, and classifies each against the discrimination
standard the r16–r18 tie hunts settled:

  CONVERTED    q6/q9 call — integer-domain round: both engines multiply
               the same IEEE double by 10^k and round the identical
               product; a half-tie there requires the product to BE an
               exactly-representable k+0.5, which both engines then round
               identically (HALF_UP == round-half-away for the shared
               exact value). Engine-deterministic for ANY shared double.
  SAFE-RAW     round(x, k) where x is raw-float arithmetic (parquet
               float/double columns through +, -, *, aggregates of them,
               or transcendentals ln/log/exp/pow of full-entropy input):
               the shortest repr of such a double has 17 significant
               digits and cannot TERMINATE on a 0.5*10^-k half, so
               Spark's shortest-repr rounding and DuckDB's exact-binary
               rounding agree (the r17 standard).
  SAFE-EXACT   round of a value that is already exact at <= k decimals
               (DECIMAL casts/sums, integer-derived values, k-dp grids
               re-rounded at the same or coarser scale): the argument is
               exactly representable, both engines see the same decimal.
  EXPOSED      everything else — quotients of exact values (a count
               ratio CAN equal a terminating decimal ending on the half
               digit), sqrt of exact values, and grid*grid products
               (<= 15-fractional-digit shortest reprs CAN land on a
               0.5*10^-9 half — r18's class 5). These must be converted
               to q6/q9 with the oracle mirrored in lockstep.

The classifier is syntactic and CONSERVATIVE: a site is SAFE only when a
proven pattern matches; anything ambiguous lands in EXPOSED for human
review/conversion. Output: a per-class count table plus every non-SAFE
site, written to stdout (SCALE.md embeds the summary; the full list is
reproducible by re-running this tool).

Annotated overrides: sites the patterns cannot see but a human proof
covers are listed in SAFE_ANNOTATED with their one-line proof, so the
census stays grep-reproducible while carrying the hand-verified facts.
"""
import os
import re
import sys

SRC = os.path.join(os.path.dirname(__file__), "..", "src", "main", "scala", "graft")

CALL_RE = re.compile(r"(?<![\w.])(round|q6|q9|q12|Fns\.q6|Fns\.q9|Fns\.q12)\(")

# Hand-verified proofs for sites the syntactic patterns cannot classify.
# Keyed by (basename, identifying substring of the argument). Each entry
# is (classification, proof). Kept deliberately small — anything that
# needs more than a line of proof should be converted instead.
SAFE_ANNOTATED = {
    # d6sum/dsum CELL quantizers whose helper argument the pattern cannot
    # see. Each cell is raw-float arithmetic or a transcendental product
    # (the r17 standard: 17-sig-digit shortest reprs), or an exact
    # decimal re-round at the same scale.
    ("DataQuality.scala", "chi2, 6"): ("SAFE-EXACT", "chi2 = DECIMAL(28,6) sum cast double; 6-dp re-round recovers the exact grid"),
    ("DataQuality.scala", "c, 6"): ("SAFE-RAW", "dsum cell: (cnt/n)*log(n/cnt) - transcendental-dominated"),
    ("Dedup.scala", "cos, 6"): ("SAFE-RAW", "raw float cosine; 17-sig-digit shortest repr"),
    ("Dedup.scala", "sMid, 2"): ("SAFE-EXACT", "(b+0.5)/10 has <= 2 fractional digits; a 2-dp round has no digit-3 half"),
    ("Dedup.scala", "lit(1.0) - y8, 6"): ("SAFE-RAW", "y8 = S-curve power (pow) - transcendental-dominated"),
    ("ML.scala", "c, 6"): ("SAFE-RAW", "d6sum cell: raw float x 6-dp grid product (r17 raw-product standard)"),
    ("ML.scala", "r * 1e9"): ("CONVERTED", "inline integer-domain re-round (BIGINT r6 chain, SCALE.md r17)"),
    ("Similarity.scala", "a * b, 9"): ("SAFE-RAW", "xm (raw-minus-grid, full-entropy) x pc grid: raw operand dominates"),
    ("Similarity.scala", "cov * 1e6"): ("CONVERTED", "effectiveRank exact-decimal division (r18, Similarity.scala)"),
    ("Similarity.scala", "c, 6"): ("SAFE-RAW", "dsum cell over raw float coordinates"),
    ("Sketch.scala", "theory, 6"): ("SAFE-RAW", "1-(1-s^r)^b - transcendental-dominated"),
    ("Sketch.scala", "c, 6"): ("SAFE-RAW", "dsum cell: raw float clamped values"),
    ("TimeSeries.scala", "c, 6"): ("SAFE-RAW", "d6sum cell: grid x cos/sin product - transcendental-dominated"),
    ("TextAnalysis.scala", "hRaw, 6"): ("SAFE-RAW", "log(n_tokens) dominates (irrational for n>=2; n=1 collapses to an exact grid)"),
    ("Fns.scala", "c * lit(1e6)"): ("CONVERTED", "the q6 definition itself"),
    ("Fns.scala", "c * lit(1e9)"): ("CONVERTED", "the q9 definition itself"),
    ("Fns.scala", "c * lit(1e12)"): ("CONVERTED", "the q12 definition itself"),
    ("Dedup.scala", 'aggregate( zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1L)'[:40]): ("SAFE-EXACT",
        "minhash agreement k/16: dyadic, exactly representable at <= 4 dp"),
    ("Sketch.scala", "inter * lit(1e4)"): ("CONVERTED", "inline 4-dp integer-domain round"),
    ("Sketch.scala", 'try_divide(inter, col("est_union")) * lit(1e4)'[:40]): ("CONVERTED", "inline 4-dp integer-domain round"),
    ("Sketch.scala", 'try_divide(inter, col("est_union")) * l'): ("CONVERTED", "inline 4-dp integer-domain round"),
    # Perturb writes fixtures ONCE; both engines read the same parquet, so
    # its rounds never cross an engine boundary.
    ("Perturb.scala", 'col("l_extendedprice") * (lit(0.9) + h('[:40]): ("SAFE-GEN", "single-engine fixture generation"),
    ("Perturb.scala", 'col("l_extendedprice") * (lit(0.9) + h(2001, "p", lk: _*) / lit(1e4)), 2'[:40]): ("SAFE-GEN", "single-engine fixture generation"),
    ("Perturb.scala", 'col("o_totalprice") * (lit(0.9) + h(2001'[:40]): ("SAFE-GEN", "single-engine fixture generation"),
    ("Perturb.scala", 'col("value") * (lit(0.8) + h(4001, "v", '): ("SAFE-GEN", "single-engine fixture generation"),
}


def extract_arg(text, start):
    """Return the balanced-paren argument list starting at text[start]=='('."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return text[start + 1:i]
    return text[start + 1:]


def strip_comments(text):
    # Remove // comments (string literals in operator code never hold //)
    # and /* */ blocks so commented-out examples don't count as sites.
    # Newlines are preserved so reported line numbers match the file.
    text = re.sub(r"/\*.*?\*/", lambda m: "\n" * m.group(0).count("\n"), text, flags=re.S)
    return re.sub(r"//[^\n]*", "", text)


def classify(arg):
    a = arg.strip()
    # Transcendental-dominated values first: any log/exp/pow in the
    # argument's dataflow makes the value irrational (17-significant-digit
    # shortest repr, never terminating on a short half) EXCEPT at the
    # collapse points log(1)=0 / exp(0)=1 / pow(x,0)=1 — which are exact
    # representable values both engines round identically — and in the
    # repo's quotient-by-log shapes the zero case is try_divide-guarded.
    if re.search(r"\b(log|ln|log2|log10|exp|pow|atan|tanh|cos|sin|sigmoid)\(", a):
        return "SAFE-RAW"
    # Quotients / roots of possibly-exact values: the exposed classes
    # (a count ratio or grid quotient CAN equal a terminating decimal
    # ending on the half digit; sqrt of an exact value can be exact).
    if "try_divide" in a or "/" in a or "sqrt(" in a or "cbrt(" in a:
        return "EXPOSED-QUOTIENT"
    # Explicit DECIMAL arithmetic is exact at its scale.
    if re.search(r'cast\("decimal', a) or ".cast(\"decimal" in a:
        return "SAFE-EXACT"
    # Integer-typed sources rounded for presentation.
    if re.search(r'\.cast\("double"\)', a) and not re.search(r"[*]", a):
        return "SAFE-EXACT" if not re.search(r"[+-]", a) else "SAFE-RAW"
    # Pure raw-float arithmetic over columns: +, -, * of col()s / lits.
    if re.fullmatch(r"[\w\s.$\"'()+*,-]*", a) and "col(" in a:
        return "SAFE-RAW"
    return "EXPOSED-OTHER"


def main():
    rows = []
    for root, _dirs, files in os.walk(SRC):
        for fn in sorted(files):
            if not fn.endswith(".scala") or fn == "SparkEntry.scala":
                continue
            path = os.path.join(root, fn)
            with open(path, encoding="utf-8") as f:
                raw = f.read()
            text = strip_comments(raw)
            # Map cleaned offsets to line numbers of the raw file is
            # overkill; recompute lines on the cleaned text (comment
            # stripping preserves newlines for // and may drop them for
            # block comments, which the codebase uses only in headers).
            for m in CALL_RE.finditer(text):
                fname = m.group(1)
                line = text.count("\n", 0, m.start()) + 1
                arg = extract_arg(text, m.end() - 1)
                if fname.lstrip("Fns.").startswith("q") or fname in ("q6", "q9"):
                    cls = "CONVERTED"
                else:
                    cls = classify(arg)
                    key = (fn, " ".join(arg.split())[:40])
                    if key in SAFE_ANNOTATED:
                        cls = SAFE_ANNOTATED[key][0]
                rel = os.path.relpath(path, os.path.join(SRC, "..", "..", "..", ".."))
                rows.append((rel, line, fname, cls, " ".join(arg.split())[:100]))

    counts = {}
    for r in rows:
        counts[r[3]] = counts.get(r[3], 0) + 1
    print("tie-site census (src/main, SparkEntry oracle mirrors excluded)")
    for c in sorted(counts):
        print(f"  {c:18s} {counts[c]}")
    print(f"  {'TOTAL':18s} {len(rows)}")
    print()
    bad = [r for r in rows if r[3].startswith("EXPOSED")]
    if bad:
        print("sites needing conversion or hand proof:")
        for rel, line, fname, cls, arg in bad:
            print(f"  {rel}:{line} [{cls}] {fname}({arg})")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
