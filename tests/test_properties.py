"""Property-based tests (hypothesis) for the pure-Python algorithmic cores:
merge synthesis, greedy grouping, glob translation, key sanitization.

These go beyond the reference's test suite (which has no property tests —
SURVEY.md §5) and pin the ported *semantics*, not the ported code.
"""

from __future__ import annotations

import fnmatch
import re
from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import heavy

# -- strategies --------------------------------------------------------------

_scalar = st.one_of(st.none(), st.booleans(), st.integers(-5, 5), st.text(max_size=4))
_record = st.recursive(
    _scalar,
    lambda inner: st.dictionaries(
        st.text(min_size=1, max_size=4, alphabet="abcdk"), inner, max_size=4),
    max_leaves=12,
)
_records = st.lists(
    st.dictionaries(st.text(min_size=1, max_size=4, alphabet="abcdk"), _record, max_size=4),
    min_size=1, max_size=6,
)


def _flatten(d, prefix=""):
    if not isinstance(d, dict):
        return {prefix: d}
    out = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        out.update(_flatten(v, key))
    return out


# -- merge common subset / diffs ---------------------------------------------

@given(_records)
@settings(max_examples=200, deadline=None)
def test_common_subset_is_contained_in_every_record(records):
    from streamalert_spark.alerts.merge import merge_common_subset

    common = merge_common_subset(records)
    flat_common = _flatten(common) if common else {}
    for rec in records:
        flat = _flatten(rec)
        for k, v in flat_common.items():
            assert flat.get(k) == v, (k, v, rec)


@given(_records)
@settings(max_examples=200, deadline=None)
def test_diffs_plus_common_reconstruct_record(records):
    """Every flattened leaf of a record appears either in the common subset
    or in that record's ValueDiffs (alert.py:338-380 invariant)."""
    from streamalert_spark.alerts.merge import merge_common_subset, merge_value_diffs

    common = merge_common_subset(records)
    flat_common = _flatten(common) if common else {}
    for rec in records:
        diffs = merge_value_diffs(rec, common)
        for k, v in _flatten(rec).items():
            assert flat_common.get(k) == v or k in diffs


@given(_records)
@settings(max_examples=100, deadline=None)
def test_identical_records_have_empty_diffs(records):
    from streamalert_spark.alerts.merge import merge_common_subset, merge_value_diffs

    clones = [records[0]] * 3
    common = merge_common_subset(clones)
    assert merge_value_diffs(records[0], common) == {}


# -- greedy grouping ----------------------------------------------------------

_times = st.lists(
    st.integers(0, 10_000).map(lambda s: datetime(2024, 1, 1) + timedelta(seconds=s)),
    min_size=1, max_size=120,
)


@given(_times, st.integers(1, 3600), st.integers(1, 60))
@settings(max_examples=200, deadline=None)
def test_greedy_groups_partition_cap_and_window(times, window_s, cap):
    from streamalert_spark.alerts.merge import greedy_groups

    window = timedelta(seconds=window_s)
    groups = greedy_groups(times, window, cap=cap)
    # exact partition of all indices
    flat = [i for g in groups for i in g]
    assert sorted(flat) == list(range(len(times)))
    for g in groups:
        assert 1 <= len(g) <= cap
        ts = [times[i] for i in g]
        # chronological within group, span bounded by the OLDEST alert's window
        assert ts == sorted(ts)
        assert ts[-1] - ts[0] <= window


# -- glob -> LIKE translation -------------------------------------------------

def _like_match(pattern: str, s: str) -> bool:
    """Reference LIKE evaluator: % = any run, _ = one char, backslash
    escapes — the exact semantics Spark applies to our translated globs."""
    rx = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            rx.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if ch == "%":
            rx.append(".*")
        elif ch == "_":
            rx.append(".")
        else:
            rx.append(re.escape(ch))
        i += 1
    return re.fullmatch("".join(rx), s, flags=re.DOTALL) is not None


@given(st.text(alphabet="ab*?%_\\", max_size=8), st.text(alphabet="ab%_c", max_size=8))
@settings(max_examples=500, deadline=None)
def test_glob_to_like_matches_fnmatch(pattern, s):
    """glob_to_like must preserve fnmatchcase semantics for any pattern
    made of literals, *, ?, and LIKE metacharacters needing escape."""
    from streamalert_spark.classify.classifier import glob_to_like

    # fnmatch treats [ ] specially; the reference's log_patterns docs use
    # only * and ? — restrict the property to that supported surface.
    assert _like_match(glob_to_like(pattern), s) == fnmatch.fnmatchcase(s, pattern)


# -- key sanitization ---------------------------------------------------------

@given(st.text(max_size=30))
@settings(max_examples=300, deadline=None)
def test_sanitize_key_is_hive_safe_and_idempotent(key):
    from streamalert_spark.schema.sanitize import sanitize_key

    out = sanitize_key(key)
    assert re.fullmatch(r"\w*", out)
    assert sanitize_key(out) == out
    assert len(out) == len(key)  # firehose.py:42-44 replaces 1:1


@given(st.text(min_size=1, max_size=120, alphabet="abc:-. $"))
@settings(max_examples=200, deadline=None)
def test_sanitized_table_name_bounded_and_stable(name):
    from streamalert_spark.schema.sanitize import sanitized_table_name

    out = sanitized_table_name(name)
    assert len(out) <= 64
    assert re.fullmatch(r"[A-Za-z0-9_]+", out)
    assert out == sanitized_table_name(name)


# ------------------------------------------------------- fuzzy blocking

@heavy
@given(st.lists(st.text(alphabet="abcd ", min_size=1, max_size=14),
                min_size=2, max_size=12, unique=True))
@settings(max_examples=30, deadline=None)
def test_fuzzy_blocking_complete_vs_brute_force(spark, names):
    """The q-gram block + short-string branch must find EXACTLY the pairs
    the brute-force definition finds, at any mix of lengths (the short
    branch exists because the q-gram guarantee fails under q*(k+1))."""
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    from streamalert_spark.ops.fuzzy import edit_distance_pairs

    expect = {
        (min(a, b), max(a, b)): lev(a, b)
        for a, b in itertools.combinations(names, 2)
        if lev(a, b) <= 2
    }
    df = spark.createDataFrame([(x,) for x in names], "name string")
    got = {(r["n1"], r["n2"]): r["dist"]
           for r in edit_distance_pairs(df, "name", max_distance=2).collect()}
    assert got == expect


# ------------------------------------------------------- app-source replay

@given(st.integers(min_value=0, max_value=240),
       st.integers(min_value=0, max_value=240))
@settings(max_examples=50, deadline=None)
def test_app_replay_window_exact(lo, hi):
    """poll_between over the synthetic app returns EXACTLY the events in
    (start, end] — the streaming-recovery contract the offset log
    depends on."""
    from streamalert_spark.sources.app_source import SyntheticApp

    start, end = sorted((lo, hi))
    app = SyntheticApp({}, end_timestamp=250)
    got = [r["timestamp"] for r in app.poll_between(
        {"last_timestamp": start}, {"last_timestamp": end})]
    assert got == list(range(start + 1, end + 1))


# ------------------------------------------- BPE oracle merge semantics

@given(st.lists(st.sampled_from(["a", "b", "ab", "c", "aa"]),
                min_size=1, max_size=12),
       st.sampled_from([("a", "b"), ("a", "a"), ("b", "b"), ("a", "ab"),
                        ("ab", "a"), ("c", "a")]))
@settings(max_examples=500, deadline=None)
def test_bpe_closed_form_merge_equals_greedy_scan(syms, pair):
    """The BPE oracle (queries/training_ext.py _bpe_recursive_cte)
    applies a merge TOKEN-WISE via a closed form: position i starts a
    merge iff p(i) (tokens i, i+1 equal the pair) and the run of
    consecutive p-positions ending at i has odd length. Ground truth is
    the classic greedy left-to-right non-overlapping list-scan (what
    ops/bpe.py's lookaround regex computes, pinned separately by
    test_learn_bpe_matches_reference). The two must agree on every
    token sequence — including runs of identical symbols >= 5, where a
    naive sentinel-replace approach diverges."""
    a, b = pair
    # ground truth: greedy left-to-right non-overlapping pair merge
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    expected = " ".join(out)
    # oracle side: the closed form mirrored from the SQL (1-based i)
    n = len(syms)
    p = [i + 1 < n and syms[i] == a and syms[i + 1] == b for i in range(n)]
    m = [False] * n
    last_p0 = -1  # SQL's COALESCE(..., 0) with 1-based positions
    for i in range(n):
        if not p[i]:
            last_p0 = i
        else:
            m[i] = (i - last_p0) % 2 == 1
    emitted = []
    for i in range(n):
        if m[i]:
            emitted.append(a + b)
        elif i > 0 and m[i - 1]:
            continue  # consumed
        else:
            emitted.append(syms[i])
    assert " ".join(emitted) == expected
