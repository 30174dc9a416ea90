"""Property-based tests (SURVEY.md §5.4) — hypothesis over the pure
driver-side layers (cell grammars, spec normalization), where thousands
of examples run in milliseconds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from orion_etl_oracle_to_postgres_spark import configgen as cg
from orion_etl_oracle_to_postgres_spark.spec import MappingSpec

# identifiers as they appear in spreadsheet cells: no grammar
# metacharacters (: = . ,) and no surrounding whitespace
_ident = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"
    ),
    min_size=1,
    max_size=12,
).filter(lambda s: not s.isdigit())


@st.composite
def lookup_specs(draw):
    spec = {"table": draw(_ident), "key_column": draw(_ident)}
    if draw(st.booleans()):
        spec["value_column"] = draw(_ident)
    om = draw(st.sampled_from([None, "skip", "error", "default"]))
    if om:
        spec["on_missing"] = om
    return spec


@given(lookup_specs())
@settings(max_examples=300)
def test_lookup_cell_round_trip(spec):
    assert cg.parse_lookup_cell(cg.format_lookup_cell(spec)) == spec


@st.composite
def validation_rules(draw):
    typ = draw(st.sampled_from(["regex", "range", "lookup"]))
    if typ == "regex":
        # any pattern without the list separator survives the cell format
        pat = draw(st.text(min_size=1, max_size=20).filter(lambda s: "," not in s and s.strip() == s and s))
        return {"type": "regex", "pattern": pat}
    if typ == "range":
        lo, hi = draw(st.integers(-1000, 1000)), draw(st.integers(-1000, 1000))
        return {"type": "range", "pattern": f"{lo}-{hi}"}
    rule = {
        "type": "lookup",
        "lookup": {"table": draw(_ident), "key_column": draw(_ident)},
    }
    of = draw(st.sampled_from([None, "skip", "error"]))
    if of:
        rule["lookup"]["on_missing"] = of
        rule["on_fail"] = of
    return rule


@given(st.lists(validation_rules(), min_size=1, max_size=5))
@settings(max_examples=300)
def test_validation_cell_round_trip(rules):
    assert cg.parse_validation_cell(cg.format_validation_cell(rules)) == rules


@given(st.lists(_ident, min_size=0, max_size=6))
@settings(max_examples=200)
def test_transform_string_normalization(ops):
    """MappingSpec accepts 'a, b ,c' and yields the clean list — the
    reference's comma-grammar (mappings/parser.py:71-75)."""
    joined = " , ".join(ops)
    spec = MappingSpec(source="s", target="t", transform=joined)
    assert (spec.transform or []) == ops


@given(st.lists(st.one_of(_ident, st.just("")), max_size=6))
@settings(max_examples=200)
def test_cell_list_drops_blanks(items):
    out = cg.cell_list(",".join(items))
    expected = [i for i in items if i.strip()] or None
    assert out == expected


# ---- round-4 pure helpers ----

from orion_etl_oracle_to_postgres_spark.compiler import _watermark_sql_literal


@given(st.text(max_size=40))
@settings(max_examples=300)
def test_watermark_string_column_always_quoted_and_escaped(s):
    """For a string-typed watermark column the literal is ALWAYS a
    quoted string (lexicographic compare, matching the Spark-side
    filter) with embedded quotes doubled — no value can break out of
    the literal."""
    lit = _watermark_sql_literal(s, "string")
    assert lit == "'" + s.replace("'", "''") + "'"
    # interior of the literal never contains a lone quote
    assert "''" * lit[1:-1].count("''") or "'" not in lit[1:-1]


@given(st.integers(-10**12, 10**12))
@settings(max_examples=200)
def test_watermark_numeric_column_unquoted(n):
    assert _watermark_sql_literal(n, "bigint") == str(n)
    assert _watermark_sql_literal(str(n), "bigint") == str(n)


import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent / "tools"))
from check_correctness import compare_result  # noqa: E402

_cell = st.one_of(
    st.integers(-5, 5),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=5),
    st.none(),
)


@given(st.lists(st.tuples(_cell, _cell), min_size=1, max_size=8), st.data())
@settings(max_examples=150)
def test_compare_result_reflexive_and_change_sensitive(rows, data):
    """Identical result sets always pass; changing any single cell to a
    DIFFERENT value is always caught (the layering bug this guards
    against made healthy queries skip the value comparison)."""
    cols = ["a", "b"]
    dt = [("a", "string"), ("b", "string")]
    ds = [("a", "VARCHAR"), ("b", "VARCHAR")]
    assert compare_result(cols, rows, dt, cols, list(rows), ds) == []
    i = data.draw(st.integers(0, len(rows) - 1))
    j = data.draw(st.integers(0, 1))
    old = rows[i][j]
    new = data.draw(_cell.filter(lambda v: v != old and not (
        isinstance(v, float) and isinstance(old, (int, float)) and v == old)))
    mutated = list(rows)
    t = list(mutated[i]); t[j] = new; mutated[i] = tuple(t)
    assert compare_result(cols, rows, dt, cols, mutated, ds)


# ---------------- KMV set-algebra invariants ----------------
# The sketch math is portable md5 arithmetic, so a pure-Python replay
# IS the model (the same construction the DuckDB oracles replay);
# hypothesis drives the model hard, and test_aggstate pins Spark ==
# model on representative cases (Spark-per-example would be ~1000x
# slower than the property is worth).

import hashlib as _hashlib


def _py_hash60(v, seed: str) -> int:
    return int(
        _hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16
    )


def _py_kmv(vals, k: int, seed: str = "t"):
    return sorted({_py_hash60(v, seed) for v in vals})[:k]


def _py_set_est(a_hashes, b_hashes, k: int):
    ua = set(a_hashes) | set(b_hashes)
    bk = sorted(ua)[:k]
    n_kept = len(bk)
    sa, sb = set(a_hashes), set(b_hashes)
    both = sum(1 for h in bk if h in sa and h in sb)
    na_bk = sum(1 for h in bk if h in sa)
    if n_kept < k:
        union_d = float(n_kept)
    else:
        union_d = round((k - 1) / (bk[-1] / float(1 << 60)), 0)
    rho = both / n_kept if n_kept else 0.0
    diff_ab = int(round((na_bk - both) / n_kept * union_d, 0)) if n_kept else 0
    diff_ba = (
        int(round((n_kept - na_bk) / n_kept * union_d, 0)) if n_kept else 0
    )
    return (
        n_kept, int(union_d), int(round(rho * union_d, 0)), round(rho, 6),
        diff_ab, diff_ba,
    )


@given(
    st.sets(st.integers(0, 10_000), max_size=200),
    st.sets(st.integers(0, 10_000), max_size=200),
    st.integers(4, 64),
)
@settings(max_examples=200)
def test_kmv_set_estimates_model_invariants(a, b, k):
    if not a and not b:
        return
    ha, hb = _py_kmv(a, k), _py_kmv(b, k)
    n_kept, union_est, intersect_est, jac, dab, dba = _py_set_est(ha, hb, k)
    # exact branch: union kept < k  =>  every estimate is exact,
    # including BOTH set differences
    if n_kept < k:
        assert union_est == len(a | b)
        assert intersect_est == len(a & b)
        assert dab == len(a - b) and dba == len(b - a)
        truth = len(a & b) / len(a | b) if (a | b) else 0.0
        assert abs(jac - round(truth, 6)) <= 1e-6
    # identity: A vs A
    ni, ui, ii, ji, dab_i, dba_i = _py_set_est(ha, ha, k)
    assert ii == ui and (ji == 1.0 or ni == 0)
    assert dab_i == 0 and dba_i == 0
    # bounds: intersection never exceeds union; jaccard in [0, 1];
    # the three estimates partition the union up to the 3 roundings
    assert 0 <= intersect_est <= union_est
    assert 0.0 <= jac <= 1.0
    assert dab >= 0 and dba >= 0
    assert abs((intersect_est + dab + dba) - union_est) <= 2
    # disjointness: no shared value => no shared hash (md5 is a pure
    # function) => estimated intersection exactly 0
    if not (a & b):
        assert intersect_est == 0 and jac == 0.0
        assert abs(dab + dba - union_est) <= 2


@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=300),
    st.integers(1, 5),
    st.integers(4, 32),
)
@settings(max_examples=200)
def test_kmv_fold_equals_full_build_any_split(vals, n_parts, k):
    """Bottom-k of the union of per-part bottom-k sets == bottom-k of
    everything, for ANY partitioning — the merge exactness the Spark
    operators rely on (the k smallest of a union are each within their
    part's k smallest)."""
    parts = [vals[i::n_parts] for i in range(n_parts)]
    folded = sorted(
        {h for p in parts for h in _py_kmv(p, k)}
    )[:k]
    assert folded == _py_kmv(vals, k)


# ---------------- Bloom membership invariants ----------------
# Same argument as the KMV block: the bit positions are portable md5
# double-hashing (operators/aggstate.py:_bloom_positions, the
# construction the DuckDB oracles replay), so a pure-Python replay IS
# the model; test_aggstate pins Spark == model on representative cases.


def _py_bloom_positions(v, m: int, k: int, seed: str = "bloom"):
    hx = _hashlib.md5(f"{v}:{seed}".encode()).hexdigest()
    h1 = int(hx[0:15], 16) % m
    h2 = (int(hx[16:31], 16) % m) | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _py_bloom_build(vals, m: int, k: int, seed: str = "bloom"):
    words = {}
    for v in vals:
        for b in _py_bloom_positions(v, m, k, seed):
            words[b >> 6] = words.get(b >> 6, 0) | (1 << (b & 63))
    return words


def _py_bloom_probe(words, v, m: int, k: int, seed: str = "bloom") -> bool:
    return all(
        words.get(b >> 6, 0) & (1 << (b & 63))
        for b in _py_bloom_positions(v, m, k, seed)
    )


_bloom_m = st.sampled_from([64, 128, 512, 4096])
_bloom_k = st.integers(1, 16)


@given(st.sets(st.integers(0, 10_000), max_size=150), _bloom_m, _bloom_k)
@settings(max_examples=200)
def test_bloom_no_false_negatives_and_bounds(vals, m, k):
    """One-sided guarantee (the load-bearing branch): every inserted
    key probes HIT, for any (m, k) layout; empty state probes all-miss
    (identity); positions stay in [0, m) and — h2 odd, m a power of
    two — the k probes of one key never collide (k ≤ 16 < 64 ≤ m), so
    each key really sets/tests k distinct bits."""
    words = _py_bloom_build(vals, m, k)
    for v in vals:
        assert _py_bloom_probe(words, v, m, k)
        pos = _py_bloom_positions(v, m, k)
        assert all(0 <= b < m for b in pos)
        assert len(set(pos)) == len(pos)
    empty = _py_bloom_build([], m, k)
    for v in list(vals)[:5] or [0]:
        assert not _py_bloom_probe(empty, v, m, k)


@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=200),
    st.integers(1, 5),
    _bloom_m,
    _bloom_k,
)
@settings(max_examples=200)
def test_bloom_fold_equals_full_build_any_split(vals, n_parts, m, k):
    """Word-wise OR of per-part states == the full-history state, for
    ANY partitioning — OR is idempotent/commutative/associative, so
    replayed increments and arbitrary fold orders are harmless (the
    equality merge_bloom_states relies on)."""
    parts = [vals[i::n_parts] for i in range(n_parts)]
    folded = {}
    for p in parts:
        for wi, w in _py_bloom_build(p, m, k).items():
            folded[wi] = folded.get(wi, 0) | w
    assert folded == _py_bloom_build(vals, m, k)
    # idempotence: folding the same increment twice changes nothing
    for wi, w in _py_bloom_build(parts[0], m, k).items():
        folded[wi] = folded.get(wi, 0) | w
    assert folded == _py_bloom_build(vals, m, k)


# ---------------- CMS frequency invariants ----------------


def _py_cms_cols(v, w: int, d: int, seed: str = "cms"):
    hx = _hashlib.md5(f"{v}:{seed}".encode()).hexdigest()
    h1 = int(hx[0:15], 16) % w
    h2 = (int(hx[16:31], 16) % w) | 1
    return [(h1 + r * h2) % w for r in range(d)]


def _py_cms_build(pairs, w: int, d: int, seed: str = "cms"):
    """pairs: (value, weight) with weight >= 0; cells keyed (row, col)."""
    cells = {}
    for v, wt in pairs:
        for r, c in enumerate(_py_cms_cols(v, w, d, seed)):
            cells[(r, c)] = cells.get((r, c), 0) + wt
    return cells


def _py_cms_estimate(cells, v, w: int, d: int, seed: str = "cms") -> int:
    return min(
        cells.get((r, c), 0)
        for r, c in enumerate(_py_cms_cols(v, w, d, seed))
    )


_cms_w = st.sampled_from([16, 64, 1024])
_cms_d = st.integers(1, 8)


@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 9)),
        min_size=1,
        max_size=200,
    ),
    _cms_w,
    _cms_d,
)
@settings(max_examples=200)
def test_cms_never_underestimates(pairs, w, d):
    """The one-sided guarantee: for every inserted key, the min-over-
    rows estimate is >= its true weighted count (each counter carries
    truth plus NON-NEGATIVE collision mass); never-inserted keys
    estimate >= 0; the per-key row columns stay in [0, w)."""
    cells = _py_cms_build(pairs, w, d)
    truth = {}
    for v, wt in pairs:
        truth[v] = truth.get(v, 0) + wt
    for v, t in truth.items():
        assert _py_cms_estimate(cells, v, w, d) >= t
        assert all(0 <= c < w for c in _py_cms_cols(v, w, d))
    for probe in (10_001, 10_002):  # outside the value domain
        assert _py_cms_estimate(cells, probe, w, d) >= 0


@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 9)),
        min_size=1,
        max_size=200,
    ),
    st.integers(1, 5),
    _cms_w,
    _cms_d,
)
@settings(max_examples=200)
def test_cms_fold_equals_full_build_any_split(pairs, n_parts, w, d):
    """Cell-wise SUM of per-part states == the full-history state, for
    ANY partitioning (count additivity — the merge_cms_states
    equality), and folding more data is MONOTONE: no estimate ever
    decreases when an increment lands (the property frequency-cap
    gating depends on)."""
    parts = [pairs[i::n_parts] for i in range(n_parts)]
    folded = {}
    for p in parts:
        for cell, cnt in _py_cms_build(p, w, d).items():
            folded[cell] = folded.get(cell, 0) + cnt
    full = _py_cms_build(pairs, w, d)
    assert folded == full
    before = {v: _py_cms_estimate(_py_cms_build(parts[0], w, d), v, w, d)
              for v, _ in pairs[:20]}
    for v, est in before.items():
        assert _py_cms_estimate(full, v, w, d) >= est


# ---------------- bottom-k sample-state invariants ----------------
# Same argument as the KMV/Bloom/CMS blocks: the panel is bottom-k of
# portable md5 hashes over the DISTINCT ids (order (hash, id) — the
# construction the DuckDB oracles replay), so a pure-Python replay IS
# the model; test_aggstate + test_statemaint pin Spark == model on
# representative cases.

import math as _math


def _py_panel(ids, k: int, seed: str = "s"):
    """The sample state as (hash, id) pairs: bottom-k over distinct
    non-null ids ordered by (hash, id)."""
    uniq = {v for v in ids if v is not None}
    return sorted((_py_hash60(v, seed), v) for v in uniq)[:k]


def _py_nearest_rank(panel, val_fn, qs):
    """finalize_sample_quantiles' model: rank the panel by
    (value, id), pick rank ceil(q*n)."""
    ranked = sorted((val_fn(v), v) for _, v in panel)
    n = len(ranked)
    return [ranked[_math.ceil(q * n) - 1][0] for q in qs]


@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=300),
    st.integers(1, 5),
    st.integers(2, 32),
)
@settings(max_examples=200)
def test_sample_fold_equals_full_build_any_split(vals, n_parts, k):
    """Bottom-k (by hash, id) of the union of per-part panels == the
    full-history panel, for ANY partitioning — the merge exactness
    the declarative state: block and the streaming panel rely on;
    duplicates across parts collapse (the distinct contract)."""
    parts = [vals[i::n_parts] for i in range(n_parts)]
    folded = sorted({p for part in parts for p in _py_panel(part, k)})[:k]
    assert folded == _py_panel(vals, k)


@given(
    st.sets(st.integers(0, 10_000), min_size=1, max_size=120),
    st.integers(2, 32),
    st.integers(1, 32),
)
@settings(max_examples=200)
def test_sample_prefix_consistency_and_exact_below_k(ids, k, j):
    """Two structure properties: (1) PREFIX CONSISTENCY — the first
    j <= k members of the k-panel ARE the j-panel (one persisted state
    serves every panel size); (2) EXACT BELOW K — fewer than k
    distinct ids means the panel is the whole population, so every
    downstream estimator's exact branch fires."""
    j = min(j, k)
    assert _py_panel(ids, k)[:j] == _py_panel(ids, j)
    if len(ids) <= k:
        assert {v for _, v in _py_panel(ids, k)} == ids
    # duplicates/re-ingest change nothing
    dup = list(ids) * 3
    assert _py_panel(dup, k) == _py_panel(ids, k)


@given(
    st.sets(st.integers(0, 10_000), min_size=1, max_size=120),
    st.integers(2, 32),
    st.lists(
        st.floats(0.01, 1.0, allow_nan=False), min_size=1, max_size=4
    ),
)
@settings(max_examples=200)
def test_sample_quantiles_nearest_rank_invariants(ids, k, qs):
    """The carried-value quantile read (finalize_sample_quantiles
    model): (1) every estimate is a sample member's true value;
    (2) MONOTONE in q; (3) q=1.0 is the sample max; (4) EXACT below k
    — equals the population nearest-rank quantile; (5) invariant
    under any split of the ingest (fold == full build)."""
    val = lambda v: (v * 37) % 1000  # noqa: E731 — pure function of id
    panel = _py_panel(ids, k)
    got = _py_nearest_rank(panel, val, sorted(qs) + [1.0])
    sample_vals = sorted(val(v) for _, v in panel)
    assert all(g in sample_vals for g in got)
    assert got == sorted(got)  # monotone in q
    assert got[-1] == sample_vals[-1]  # q=1.0 -> max
    if len(ids) <= k:
        pop = sorted(val(v) for v in ids)
        for q, g in zip(sorted(qs), got[:-1]):
            assert g == pop[_math.ceil(q * len(pop)) - 1]
    two = [list(ids)[0::2], list(ids)[1::2]]
    folded = sorted({p for part in two for p in _py_panel(part, k)})[:k]
    assert _py_nearest_rank(folded, val, sorted(qs)) == got[:-1]


# ---------------- histogram-state invariants ----------------
# The bucket arithmetic is closed-form on exact integer counts
# (operators/aggstate.py:build_hist_state / finalize_hist_quantiles —
# the construction the DuckDB oracles replay), so a pure-Python replay
# IS the model; test_aggstate pins Spark == model on representative
# cases. Integer values keep every sum exact in doubles.


def _py_hist_build(vals, lo, hi, nb, weights=None):
    """(buckets, n, mn, mx): clamp-to-edge bucketing, true extent."""
    width = (hi - lo) / nb
    buckets = [0] * nb
    n = 0
    mn = mx = None
    for i, v in enumerate(vals):
        w = 1 if weights is None else weights[i]
        b = int(_math.floor((v - lo) / width))
        b = 0 if b < 0 else (nb - 1 if b >= nb else b)
        buckets[b] += w
        n += w
        mn = v if mn is None else min(mn, v)
        mx = v if mx is None else max(mx, v)
    return buckets, n, mn, mx


def _py_hist_quantile(buckets, lo, hi, nb, n, q):
    """finalize_hist_quantiles' model: locate the bucket whose running
    count crosses q*n, interpolate linearly inside it."""
    target = q * n
    cum = 0
    width = (hi - lo) / nb
    for p, c in enumerate(buckets):
        if c > 0 and cum + c >= target and cum < target:
            return lo + width * (p + (target - cum) / c)
        cum += c
    return None


@given(
    st.lists(st.integers(-50, 150), min_size=1, max_size=200),
    st.integers(1, 5),
    st.integers(1, 32),
)
@settings(max_examples=200)
def test_hist_fold_equals_full_build_any_split(vals, n_parts, nb):
    """Element-wise bucket SUM of per-part states == the full-history
    state for ANY partitioning (count additivity — the
    merge_hist_states equality), with n summing and min/max folding;
    out-of-range mass clamps to the edge buckets but is never lost."""
    lo, hi = 0.0, 100.0
    parts = [vals[i::n_parts] for i in range(n_parts)]
    folded = [0] * nb
    fn, fmn, fmx = 0, None, None
    for p in parts:
        if not p:
            continue
        b, n, mn, mx = _py_hist_build(p, lo, hi, nb)
        folded = [x + y for x, y in zip(folded, b)]
        fn += n
        fmn = mn if fmn is None else min(fmn, mn)
        fmx = mx if fmx is None else max(fmx, mx)
    full_b, full_n, full_mn, full_mx = _py_hist_build(vals, lo, hi, nb)
    assert folded == full_b
    assert (fn, fmn, fmx) == (full_n, full_mn, full_mx)
    assert sum(full_b) == len(vals)  # conservation incl. clamped mass


@given(
    st.lists(st.integers(0, 99), min_size=1, max_size=200),
    st.integers(1, 64),
    st.floats(0.01, 1.0, allow_nan=False),
)
@settings(max_examples=200)
def test_hist_quantile_within_one_bucket_width(vals, nb, q):
    """The interpolated histogram quantile lands within ONE bucket
    width of the true nearest-rank quantile when every value lies in
    the declared range — the documented error bound."""
    lo, hi = 0.0, 100.0
    buckets, n, _, _ = _py_hist_build(vals, lo, hi, nb)
    est = _py_hist_quantile(buckets, lo, hi, nb, n, q)
    truth = sorted(vals)[_math.ceil(q * n) - 1]
    width = (hi - lo) / nb
    assert est is not None
    assert abs(est - truth) <= width + 1e-9


@given(
    st.lists(
        st.tuples(st.integers(0, 99), st.integers(1, 5)),
        min_size=1,
        max_size=100,
    ),
    st.integers(1, 32),
)
@settings(max_examples=200)
def test_hist_weighted_equals_repeated_rows(pairs, nb):
    """A weight-w row is exactly the row w times — the weighted-build
    equivalence the operator documents."""
    lo, hi = 0.0, 100.0
    vals = [v for v, _ in pairs]
    ws = [w for _, w in pairs]
    weighted = _py_hist_build(vals, lo, hi, nb, weights=ws)
    repeated = _py_hist_build(
        [v for v, w in pairs for _ in range(w)], lo, hi, nb
    )
    assert weighted == repeated


# ---------------- stats-monoid invariants ----------------


@given(
    st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=300),
    st.integers(1, 5),
)
@settings(max_examples=200)
def test_stats_monoid_fold_equals_full_any_split(vals, n_parts):
    """(count, sum, ssq, min, max) folds associatively under ANY
    partitioning — the merge_agg_states equality (integer values keep
    the double sums exact, the integerize-first rule the operators
    document for fractional inputs)."""
    def stats(p):
        return (
            len(p),
            sum(p),
            sum(v * v for v in p),
            min(p),
            max(p),
        )

    parts = [p for p in (vals[i::n_parts] for i in range(n_parts)) if p]
    folded = (
        sum(s[0] for s in map(stats, parts)),
        sum(s[1] for s in map(stats, parts)),
        sum(s[2] for s in map(stats, parts)),
        min(s[3] for s in map(stats, parts)),
        max(s[4] for s in map(stats, parts)),
    )
    assert folded == stats(vals)


def _py_weighted_quantile(panel, val_fn, w_fn, qs):
    """finalize_weighted_quantiles' model: order by (value, id),
    running weight; pick the smallest value whose running weight
    reaches q * total (the LOWER weighted quantile)."""
    ranked = sorted(((val_fn(v), v) for _, v in panel))
    total = sum(w_fn(v) for _, v in ranked)
    out = []
    for q in qs:
        cum = 0
        for val, v in ranked:
            cum += w_fn(v)
            if cum >= q * total:
                out.append(val)
                break
    return out


@given(
    st.sets(st.integers(0, 10_000), min_size=1, max_size=120),
    st.integers(2, 32),
    st.lists(
        st.floats(0.01, 1.0, allow_nan=False), min_size=1, max_size=4
    ),
)
@settings(max_examples=200)
def test_weighted_quantiles_model_invariants(ids, k, qs):
    """(1) every pick is a sample member's value; (2) MONOTONE in q;
    (3) q=1.0 is the sample max; (4) UNIT weights reduce to the
    unweighted nearest-rank picks; (5) invariant under any ingest
    split (fold == full build); (6) a heavy weight drags the median
    to its value."""
    val = lambda v: (v * 37) % 1000  # noqa: E731
    w = lambda v: 1 + v % 5  # noqa: E731
    panel = _py_panel(ids, k)
    got = _py_weighted_quantile(panel, val, w, sorted(qs) + [1.0])
    sample_vals = sorted(val(v) for _, v in panel)
    assert all(g in sample_vals for g in got)
    assert got == sorted(got)
    assert got[-1] == sample_vals[-1]
    # unit-weight reduction
    unit = _py_weighted_quantile(panel, val, lambda v: 1, sorted(qs))
    assert unit == _py_nearest_rank(panel, val, sorted(qs))
    # fold invariance
    two = [list(ids)[0::2], list(ids)[1::2]]
    folded = sorted({p for part in two for p in _py_panel(part, k)})[:k]
    assert _py_weighted_quantile(folded, val, w, sorted(qs)) == got[:-1]
    # dominance: one member carrying >half the total mass IS the median
    heavy = min(v for _, v in panel)
    hw = lambda v: 10**9 if v == heavy else 1  # noqa: E731
    (med,) = _py_weighted_quantile(panel, val, hw, [0.5])
    assert med == val(heavy)
