"""Matching-dependency (MD) validation.

Reference: md/md_verifier/md_verifier.h:19-46 (getters: GetResult,
GetTrueRhsDecisionBoundary, GetMDSuggestion, GetHighlights) and
md/md_verifier/validation/validation.cpp (ValidateRhsForRecordsPair lowers the
true RHS decision boundary to the min RHS similarity over violating pairs and
records each violating ordered pair as a highlight). An MD
``[lhs_1 ... lhs_k] -> rhs`` holds iff for EVERY ordered record pair (s, t) --
including the reflexive pairs, per the reference's single-record
md_trivial.csv case -- where every LHS classifier has
``sim_i(s[a_i], t[b_i]) >= boundary_i``, the RHS classifier satisfies
``sim_rhs(s[a], t[b]) >= rhs_boundary``.

Similarity functions (md/hymd/preprocessing/column_matches/):
  * levenshtein  -- (max_len - dist) / max_len; both empty -> 1
    (levenshtein.cpp:160-171)
  * jaccard      -- whitespace-token SET Jaccard; both empty -> 1, one
    empty -> 0 (jaccard.h:13-28, jaccard.cpp)
  * equality     -- 1.0 iff equal (null-safe), else 0.0 (equality.h)
  * lcs            -- LCS length / max length (lcs.cpp:30-40)
  * smith_waterman_gotoh -- local alignment (+1/-2/gap -0.5) normalized by
    min length (smith_waterman_gotoh.cpp); pandas-UDF kernel
  * monge_elkan    -- geometric mean of directed best-SWG-token-match means
    (monge_elkan.h:11-35); pandas-UDF kernel
  * number_difference / date_difference -- |l - r| (days for dates),
    normalized PER LEFT VALUE by that value's max distance to any right
    value (lv_normalized.h CalcFor): sim = (maxd_l - d) / maxd_l with
    maxd_l = max(l - min_right, max_right - l), computable from two global
    scalars -- no pair materialization needed for the normalizer.

Spark-first scale design: the quadratic pair space is never materialized.
Candidates come from a sound blocking join derived from one LHS classifier's
boundary (superset of all LHS-matching pairs):
  * equality        -> equi-join on the value,
  * levenshtein b>0 -> length-band join (sim >= b implies
    len_r in [b*len_l, len_l/b]),
  * jaccard b>0     -> shared-distinct-token inverted-index join (jac > 0
    requires a common token); zero-token rows pair only with zero-token rows,
  * number/date b>0 -> value-band join with bucket width (1-b)*D (the max
    per-left radius), so qualifying pairs sit in adjacent buckets,
and exact similarity evaluation (all JVM built-ins, no Python UDFs) runs on
candidates only. With no blockable classifier the check refuses to cross-join
unless allow_cross_join=True (same guard as dc.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_STRING_FNS = (
    "levenshtein",
    "jaccard",
    "equality",
    "lcs",
    "monge_elkan",
    "smith_waterman_gotoh",
)
_NUMERIC_FNS = ("number_difference", "date_difference")
#: fns whose boundary yields a sound blocking predicate; SWG / Monge-Elkan
#: normalize by the SHORTER string so high similarity puts no bound on the
#: longer side -- they cannot block, only verify.
_BLOCKABLE_FNS = ("equality", "levenshtein", "lcs", "jaccard") + _NUMERIC_FNS


# -- MD-tier similarity kernels with no Spark built-in (SURVEY 2.6): pure
# Python DPs inside Arrow-batched pandas UDFs, quadratic per PAIR but only
# ever run on blocked candidates.


def _lcs_len(a: str, b: str) -> int:
    """Rolling-row LCS length (lcs.cpp:9-28)."""
    if len(a) < len(b):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(cur[j - 1], prev[j]))
        prev = cur
    return prev[len(b)]


def _lcs_sim(a: str, b: str) -> float:
    """lcs.cpp:30-40: LCS length / max length; both empty -> 1, one -> 0."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return _lcs_len(a, b) / max(len(a), len(b))


def _swg_sim(a: str, b: str, gap: float = -0.5) -> float:
    """smith_waterman_gotoh.cpp: local alignment with match +1 / mismatch -2 /
    linear gap -0.5, normalized by min length."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    n = len(b)
    sub0 = a[0]
    v0 = [0.0] * n
    best = 0.0
    for j in range(n):
        v0[j] = max(0.0, j * gap + (1.0 if sub0 == b[j] else -2.0))
        best = max(best, v0[j])
    for i in range(1, len(a)):
        ca = a[i]
        v1 = [0.0] * n
        v1[0] = max(0.0, v0[0] + gap, 1.0 if ca == b[0] else -2.0)
        best = max(best, v1[0])
        for j in range(1, n):
            v1[j] = max(
                0.0,
                v0[j] + gap,
                v1[j - 1] + gap,
                v0[j - 1] + (1.0 if ca == b[j] else -2.0),
            )
            if v1[j] > best:
                best = v1[j]
        v0 = v1
    return best / (min(len(a), len(b)) * max(1.0, gap))


def _monge_elkan_sim(a: str, b: str) -> float:
    """monge_elkan.h:11-35: geometric mean of the two directed means of the
    best normalized-SWG token match."""
    ta, tb = a.split(), b.split()
    if not ta and not tb:
        return 1.0
    if not ta or not tb:
        return 0.0

    def directed(xs: list[str], ys: list[str]) -> float:
        return sum(max(_swg_sim(x, y) for y in ys) for x in xs) / len(xs)

    return (directed(ta, tb) * directed(tb, ta)) ** 0.5


def _pair_kernel(fn):
    @pandas_udf("double")
    def k(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [fn(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
        )

    return k


@dataclass(frozen=True)
class ColumnMatch:
    """One similarity classifier: fn(left_col, right_col) >= boundary."""

    fn: str
    left: str
    right: str
    boundary: float

    def __post_init__(self):
        if self.fn not in _STRING_FNS + _NUMERIC_FNS:
            raise ValueError(f"unknown similarity fn {self.fn!r}")

    @property
    def name(self) -> str:
        return f"{self.fn}({self.left}, {self.right})"


def _cm(spec) -> ColumnMatch:
    if isinstance(spec, ColumnMatch):
        return spec
    fn, left, right, boundary = spec
    return ColumnMatch(fn, left, right if right is not None else left, boundary)


def _tokens(col: Column) -> Column:
    t = F.trim(F.coalesce(col, F.lit("")))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.split(t, "\\s+"))
    )


def jaccard_sim(la: Column, ra: Column) -> Column:
    """Whitespace-token set Jaccard (jaccard.h:13-28 StringJaccardIndex):
    both empty -> 1, one empty -> 0, else |∩| / |∪| -- pure JVM exprs."""
    ta, tb = _tokens(la), _tokens(ra)
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(ta) + F.size(tb) - inter
    return (
        F.when((F.size(ta) == 0) & (F.size(tb) == 0), F.lit(1.0))
        .when((F.size(ta) == 0) | (F.size(tb) == 0), F.lit(0.0))
        .otherwise(inter / union.cast("double"))
    )


class MDCheck:
    """Distributed MDVerifier (md_verifier.h:19-46)."""

    def __init__(
        self,
        left: DataFrame,
        lhs: list,
        rhs,
        right: DataFrame | None = None,
        left_id: str = "id",
        right_id: str | None = None,
        allow_cross_join: bool = False,
        length_bucket: int = 16,
        max_df: int = 2**31 - 1,
        highlight_cap: int = 10_000,
    ):
        self.lhs = [_cm(s) for s in lhs]
        self.rhs = _cm(rhs)
        if not self.lhs:
            raise ValueError("MD needs at least one LHS classifier")
        self.single_table = right is None
        self.left = left
        self.right = left if right is None else right
        self.left_id = left_id
        self.right_id = right_id if right_id is not None else left_id
        self.allow_cross_join = allow_cross_join
        self.length_bucket = length_bucket
        self.max_df = max_df
        self.highlight_cap = highlight_cap
        self._scalars: dict[str, tuple[float, float, float, float]] = {}
        self._matched_df: DataFrame | None = None

    # -- projections -------------------------------------------------------
    def _num(self, cm: ColumnMatch, col: Column) -> Column:
        if cm.fn == "date_difference":
            return F.datediff(col.cast("date"), F.lit("1970-01-01").cast("date")).cast(
                "double"
            )
        return col.cast("double")

    def _proj(self, df: DataFrame, id_col: str, side: str) -> DataFrame:
        cms = self.lhs + [self.rhs]
        cols, seen = [F.col(id_col).alias(f"{side}id")], set()
        for cm in cms:
            c = cm.left if side == "l" else cm.right
            key = (c, cm.fn in _NUMERIC_FNS, cm.fn == "date_difference")
            if key in seen:
                continue
            seen.add(key)
            alias = self._attr(cm, side)
            if cm.fn in _NUMERIC_FNS:
                cols.append(self._num(cm, F.col(c)).alias(alias))
            else:
                cols.append(F.coalesce(F.col(c).cast("string"), F.lit("")).alias(alias))
        return df.select(*cols)

    def _attr(self, cm: ColumnMatch, side: str) -> str:
        c = cm.left if side == "l" else cm.right
        kind = "d" if cm.fn == "date_difference" else ("n" if cm.fn in _NUMERIC_FNS else "s")
        return f"{side}_{kind}_{c}"

    # -- per-classifier similarity expression over the candidate frame ----
    def _range_scalars(self, cm: ColumnMatch) -> tuple[float, float, float, float]:
        """(min_left, max_left, min_right, max_right) of the numeric column
        pair -- two tiny aggs, cached per column pair."""
        key = f"{cm.fn}:{cm.left}:{cm.right}"
        if key not in self._scalars:
            lmm = self.left.select(
                F.min(self._num(cm, F.col(cm.left))).alias("mn"),
                F.max(self._num(cm, F.col(cm.left))).alias("mx"),
            ).collect()[0]
            rmm = self.right.select(
                F.min(self._num(cm, F.col(cm.right))).alias("mn"),
                F.max(self._num(cm, F.col(cm.right))).alias("mx"),
            ).collect()[0]
            self._scalars[key] = (lmm.mn, lmm.mx, rmm.mn, rmm.mx)
        return self._scalars[key]

    def _sim(self, cm: ColumnMatch) -> Column:
        la, ra = F.col(self._attr(cm, "l")), F.col(self._attr(cm, "r"))
        if cm.fn == "equality":
            return F.when(la.eqNullSafe(ra), F.lit(1.0)).otherwise(F.lit(0.0))
        if cm.fn == "levenshtein":
            maxlen = F.greatest(F.length(la), F.length(ra))
            return F.when(maxlen == 0, F.lit(1.0)).otherwise(
                (maxlen - F.levenshtein(la, ra)) / maxlen.cast("double")
            )
        if cm.fn == "jaccard":
            return jaccard_sim(la, ra)
        if cm.fn == "lcs":
            return _pair_kernel(_lcs_sim)(la, ra)
        if cm.fn == "monge_elkan":
            return _pair_kernel(_monge_elkan_sim)(la, ra)
        if cm.fn == "smith_waterman_gotoh":
            return _pair_kernel(_swg_sim)(la, ra)
        # number_difference / date_difference: per-left-value normalizer
        _, _, rmn, rmx = self._range_scalars(cm)
        maxd = F.greatest(la - F.lit(rmn), F.lit(rmx) - la)
        return F.when(maxd <= 0, F.lit(1.0)).otherwise(
            (maxd - F.abs(la - ra)) / maxd
        )

    # -- candidate blocking ------------------------------------------------
    def _pick_blocker(self) -> ColumnMatch | None:
        for cm in self.lhs:
            if cm.fn == "equality" and cm.boundary > 0:
                return cm
        for cm in self.lhs:
            if cm.fn in _BLOCKABLE_FNS and cm.fn != "equality" and cm.boundary > 0:
                return cm
        return None

    def _candidates(self) -> DataFrame:
        """Sound superset of all LHS-matching ordered pairs, as (lid, rid)."""
        lp = self._proj(self.left, self.left_id, "l")
        rp = self._proj(self.right, self.right_id, "r")
        cm = self._pick_blocker()
        if cm is None:
            if not self.allow_cross_join:
                raise ValueError(
                    "no LHS classifier with boundary > 0 to block on; pass "
                    "allow_cross_join=True to accept the quadratic pair space"
                )
            return lp.crossJoin(rp)
        la, ra = F.col(self._attr(cm, "l")), F.col(self._attr(cm, "r"))
        b = float(cm.boundary)
        if cm.fn == "equality":
            return lp.join(rp, on=la.eqNullSafe(ra))
        if cm.fn in ("levenshtein", "lcs"):
            # both imply len_r in [b*len_l, len_l/b]: levenshtein via the edit
            # bound, LCS via lcs <= min_len and sim = lcs/max_len >= b
            w = self.length_bucket
            ln = F.length(la)
            lo = F.ceil(ln * F.lit(b)).cast("long")
            hi = F.floor(ln / F.lit(b)).cast("long")
            lb = lp.withColumn(
                "__bkt", F.explode(F.sequence(F.floor(lo / w), F.floor(hi / w)))
            )
            rb = rp.withColumn("__bkt", F.floor(F.length(ra) / w).cast("long"))
            return (
                lb.join(rb, on="__bkt")
                .filter(F.length(ra).between(lo, hi))
                .drop("__bkt")
            )
        if cm.fn == "jaccard":
            ltok = lp.select("lid", F.explode(_tokens(la)).alias("__tok"))
            rtok = rp.select("rid", F.explode(_tokens(ra)).alias("__tok"))
            if self.max_df < 2**31 - 1:
                hot = (
                    rtok.groupBy("__tok")
                    .agg(F.count(F.lit(1)).alias("df"))
                    .filter(F.col("df") > self.max_df)
                    .select("__tok")
                )
                rtok = rtok.join(hot, on="__tok", how="left_anti")
            pairs = ltok.join(rtok, on="__tok").select("lid", "rid").distinct()
            empties = (
                lp.filter(F.size(_tokens(la)) == 0)
                .select("lid")
                .crossJoin(rp.filter(F.size(_tokens(ra)) == 0).select("rid"))
            )
            ids = pairs.unionByName(empties)
            return ids.join(lp, on="lid").join(rp, on="rid")
        # number/date band join: per-left radius <= (1 - b) * D
        lmn, lmx, rmn, rmx = self._range_scalars(cm)
        if None in (lmn, lmx, rmn, rmx):
            return lp.limit(0).crossJoin(rp.limit(0))
        d_max = max(lmx - rmn, rmx - lmn, 0.0)
        w = (1.0 - b) * d_max
        if w <= 0:
            return lp.join(rp, on=la.eqNullSafe(ra))
        lb = lp.filter(la.isNotNull()).withColumn(
            "__bkt",
            F.explode(
                F.array(
                    F.floor(la / w) - 1, F.floor(la / w), F.floor(la / w) + 1
                )
            ),
        )
        rb = rp.filter(ra.isNotNull()).withColumn("__bkt", F.floor(ra / w))
        return lb.join(rb, on="__bkt").drop("__bkt")

    # -- verification ------------------------------------------------------
    def _matched(self) -> DataFrame:
        """Candidate pairs that satisfy every LHS classifier, with rhs_sim."""
        if self._matched_df is None:
            cand = self._candidates()
            cond = None
            for cm in self.lhs:
                c = self._sim(cm) >= F.lit(float(cm.boundary))
                cond = c if cond is None else (cond & c)
            self._matched_df = cand.filter(cond).withColumn(
                "rhs_sim", self._sim(self.rhs)
            )
        return self._matched_df

    def summary(self) -> DataFrame:
        """One row mirroring the reference getters: holds (GetResult),
        true_rhs_boundary (GetTrueRhsDecisionBoundary; equals the input
        boundary when no LHS-matching pair lies below it), the input
        boundary, suggested_rhs_boundary (GetMDSuggestion's RHS), pair and
        violation counts."""
        b = float(self.rhs.boundary)
        viol = F.col("rhs_sim") < b
        return self._matched().agg(
            F.count(F.lit(1)).alias("n_matching_pairs"),
            F.sum(viol.cast("long")).alias("n_violating_pairs"),
            F.min("rhs_sim").alias("__min_sim"),
        ).select(
            (F.coalesce(F.col("n_violating_pairs"), F.lit(0)) == 0).alias("holds"),
            F.coalesce(F.col("n_matching_pairs"), F.lit(0)).alias("n_matching_pairs"),
            F.coalesce(F.col("n_violating_pairs"), F.lit(0)).alias(
                "n_violating_pairs"
            ),
            F.least(F.lit(b), F.coalesce(F.col("__min_sim"), F.lit(b))).alias(
                "true_rhs_boundary"
            ),
            F.lit(b).alias("input_rhs_boundary"),
            F.lit(self.rhs.name).alias("rhs_column_match"),
        )

    def highlights(self) -> DataFrame:
        """Violating ordered pairs (validation.cpp ValidateRhsForRecordsPair /
        highlights.h Highlight): ids, RHS similarity, and the RHS classifier
        description the pair contradicts."""
        b = float(self.rhs.boundary)
        return (
            self._matched()
            .filter(F.col("rhs_sim") < b)
            .select(
                F.col("lid").alias("left_id"),
                F.col("rid").alias("right_id"),
                F.col("rhs_sim").alias("similarity"),
                F.lit(self.rhs.fn).alias("column_match_name"),
                F.lit(self.rhs.left).alias("left_column"),
                F.lit(self.rhs.right).alias("right_column"),
                F.lit(b).alias("decision_boundary"),
            )
            .limit(self.highlight_cap)
        )

    def suggestion(self) -> dict:
        """GetMDSuggestion analog: the input MD with the RHS boundary lowered
        to the true boundary (collects the one-row summary)."""
        row = self.summary().collect()[0]
        return {
            "lhs": [(cm.name, cm.boundary) for cm in self.lhs],
            "rhs": (self.rhs.name, row.true_rhs_boundary),
            "holds": row.holds,
        }


def md_check(
    left: DataFrame,
    lhs: list,
    rhs,
    right: DataFrame | None = None,
    left_id: str = "id",
    right_id: str | None = None,
    **kwargs,
) -> MDCheck:
    """Verify an MD. Classifiers are (fn, left_col, right_col_or_None,
    boundary) tuples or ColumnMatch instances; right=None verifies over one
    table (ordered pairs incl. reflexive, matching the reference)."""
    return MDCheck(
        left, lhs, rhs, right=right, left_id=left_id, right_id=right_id, **kwargs
    )
