"""Gates for the bench harness's self-adjudication tooling.

bench.py's band_suspect labeling is the round-over-round honesty
record (BENCH_NOTES r11): a >2x regression vs the newest COMMITTED
BENCH_r*.json on code git shows unchanged is the VM stall band's
signature and must be labeled as such — while a regression on any
query whose import graph reaches a changed module must NOT be
auto-excused. These tests pin that logic against the real repo state
(git history + the committed BENCH_r10.json record), so they also fail
if the record format drifts.
"""
from __future__ import annotations

import importlib.util
import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def prior_record():
    files = sorted(
        f for f in os.listdir(REPO)
        if f.startswith("BENCH_r") and f.endswith(".json")
    )
    if not files:
        pytest.skip("no committed BENCH_r*.json in this checkout")
    newest_committed = None
    for f in reversed(files):
        c = subprocess.run(
            ["git", "-C", REPO, "log", "-1", "--format=%H", "--", f],
            capture_output=True, text=True, timeout=30,
        ).stdout.strip()
        if c:
            newest_committed = f
            break
    if newest_committed is None:
        pytest.skip("no BENCH_r*.json known to git")
    with open(os.path.join(REPO, newest_committed)) as fh:
        rec = json.load(fh).get("parsed", {}).get("queries", {})
    if not rec:
        pytest.skip("prior record carries no inline queries")
    return newest_committed, rec


def test_band_suspects_label_and_attribution(bench_mod, prior_record):
    from data_transformation_2022_spark import queries as q

    fname, prior = prior_record
    qs = {n: d.spark for n, d in q.REGISTRY.items()}
    usable = [n for n in prior if n in qs and prior[n] and prior[n] > 0]
    if len(usable) < 2:
        pytest.skip("prior record too thin to exercise")
    # every usable entry regressed 3x: each must either be flagged
    # band_suspect or carry a NON-EMPTY changed-code overlap — never
    # silently dropped, never flagged with an overlap present
    timings = {n: round(prior[n] * 3.0, 3) for n in usable}
    out = bench_mod._band_suspects(timings, qs)
    assert set(out) == {"suspects", "harness_changed"}
    suspects = out["suspects"]
    assert isinstance(out["harness_changed"], list)
    assert set(suspects) == set(usable)
    for n, d in suspects.items():
        assert d["prior"] == prior[n]
        assert d["prior_file"] == fname
        assert d["band_suspect"] == (not d["changed_overlap"]), n
        assert isinstance(d["exonerated"], list)

    # within-2x moves and improvements are never labeled
    ok = {n: prior[n] * 1.5 for n in usable}
    ok.update({usable[0]: prior[usable[0]] * 0.5})
    assert bench_mod._band_suspects(ok, qs).get("suspects", {}) == {}

    # entries git can't attribute (absent from the prior record) are
    # skipped rather than guessed at
    ghost = {"no_such_query_xyz": 99.0}
    assert bench_mod._band_suspects(ghost, qs).get("suspects", {}) == {}


def test_band_suspects_never_raises(bench_mod):
    """The bench must not die on adjudication: garbage inputs return
    a safe shape (the documented degrade path), never an exception."""
    for bad in ({}, {"x": float("inf")}, {"x": -1.0}):
        out = bench_mod._band_suspects(bad, {"x": None})
        assert out.get("suspects", {}) == {}


OLD_MOD = '''"""doc."""
X = 1

def alpha(a):
    return a + X

def beta(b):
    return alpha(b) * 2

def gamma(c):
    return c - 1
'''


def test_changed_fn_map_function_level(bench_mod):
    """ast-level module diff: docstring-only and full-line-comment
    edits are invisible; a changed def or single-name constant names
    exactly itself (so reach-level attribution applies); non-named
    module-level code changes raise the residue flag (file-level
    fallback)."""
    doc_only = OLD_MOD.replace('"""doc."""', '"""other doc."""')
    assert bench_mod._changed_fn_map(OLD_MOD, doc_only) == (set(), False)
    full_line = OLD_MOD.replace("X = 1", "# a comment\nX = 1")
    assert bench_mod._changed_fn_map(OLD_MOD, full_line) == (set(), False)
    # an inline comment lives on the constant's own segment line
    comment_only = OLD_MOD.replace("X = 1", "X = 1  # noqa")
    assert bench_mod._changed_fn_map(OLD_MOD, comment_only) == ({"X"}, False)

    one_fn = OLD_MOD.replace("return c - 1", "return c - 2")
    assert bench_mod._changed_fn_map(OLD_MOD, one_fn) == ({"gamma"}, False)

    # single-name constants are NAMED changes, not file-level residue
    const = OLD_MOD.replace("X = 1", "X = 2")
    assert bench_mod._changed_fn_map(OLD_MOD, const) == ({"X"}, False)

    added = OLD_MOD + "\ndef delta(d):\n    return d\n"
    assert bench_mod._changed_fn_map(OLD_MOD, added) == ({"delta"}, False)

    # non-named module-level code → residue flag (file-level fallback)
    loose = OLD_MOD + "\nprint(alpha(X))\n"
    assert bench_mod._changed_fn_map(OLD_MOD, loose)[1] is True

    # unparseable side → None (caller falls back to file-level)
    assert bench_mod._changed_fn_map(OLD_MOD, "def broken(:") is None


def test_reach_names_transitive(bench_mod):
    """Reach expands through reached definitions to a fixpoint: a seed
    naming beta reaches alpha (beta calls it) and the constant X
    (alpha reads it), but never gamma."""
    segs = bench_mod._top_level_map(OLD_MOD)[0]
    assert set(segs) == {"X", "alpha", "beta", "gamma"}
    assert bench_mod._reach_names("y = beta(3)", segs) == {"beta", "alpha", "X"}
    assert bench_mod._reach_names("y = gamma(3)", segs) == {"gamma"}
    assert bench_mod._reach_names("nothing here", segs) == set()


def test_streaming_entries_carry_repeat_reserve(bench_mod):
    """The eight streaming queries must resolve as reserve entries by
    tag (the bench gives them STREAM_RESERVE_S extra repeat budget so
    they are never single-run — r10/r11 adjudication debt)."""
    from data_transformation_2022_spark.queries import REGISTRY

    reserve = {n for n, qd in REGISTRY.items() if "streaming" in qd.tags}
    assert "stream_stream_join" in reserve
    assert "stream_lsh_neardup" in reserve
    assert bench_mod.STREAM_RESERVE_S > 0
