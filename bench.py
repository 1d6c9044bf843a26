"""Benchmark harness: runs EVERY registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Each query is forced end-to-end with the "noop" sink (computes every
output column and row, no driver collect) so timings reflect the full
plan, not a pruned count(*).

Honesty rules (so round-over-round comparison stays meaningful):
* EVERY entry is min-of-2 (round 8; rounds 3-7 were single-shot with a
  separate sf0.001 warm pass + adjacent warm for dynamic-literal tags
  only): each query executes twice back-to-back at the bench SF and the
  reported figure is the minimum. Run 1 is the adjacent warm — it pays
  whole-stage-codegen/JIT for THIS plan at THIS SF (the JVM codegen
  cache holds ~100 generated classes, so a warm pass early in a
  170-query suite is evicted before the timed loop arrives; measured:
  coret_pca 24.7 s cold vs 1.5 s adjacent-warm) — and the min of two
  adjacent executions suppresses this VM's roaming multi-second stall
  phases (four otherwise-identical r7 suite runs spread 236-285 s;
  corpus_dsir_weights read 11.4 s in-suite vs 2.7 s isolated-warm).
  This subsumes both the old global warm pass and the dynamic-literal
  special case. BOTH raw runs are recorded in BENCH_LOCAL.json under
  "runs" so the spread stays auditable.
* Queries that persist() shared intermediate stages (profile_outliers,
  pipeline_curate_corpus, engine paths) reuse run 1's materialized
  stages in run 2 — same convention as the BENCH_NOTES "warm figures"
  the per-round record is compared against, stated here so nobody
  mistakes those minima for cold-cache numbers.
* The rid-table build at the bench SF (ingest-time layout work — the
  cluster equivalent of writing a table bucketed/sorted once at load) is
  TIMED and reported as the "ingest_rid_tables" entry, included in the
  total; it stays SINGLE-RUN by design (a second build would read the
  already-prepared layout and report ~0 — a lie), and is listed in
  "single_run" in the output. Timed queries then run against the
  prepared tables at steady state, exactly like a warehouse working set.
* The persisted IVF index is built BEFORE the timed loop and timed as
  its own "ivf_index_build" entry (force_rebuild on BOTH runs, min-of-2
  like everything else), so "sim_ivf_persisted" measures what its name
  claims: steady-state serving against an existing index, not an
  amortized build.
* Pair-spread guard (round 9, self-adjudicating since round 10): every
  min-of-2 entry records its spread over the two FASTEST runs
  ("spreads" in BENCH_LOCAL.json). A pair differing >2x buys ONE extra
  run (min-of-3 for flagged entries only — a lone VM stall is outvoted
  by the two clean runs); entries still >2x over their two fastest
  runs land in "spread_flags" and "spread_stats"
  (n_flagged/median/max, + ceil-rank p90 when n >= 10). The reported
  min is still the honest figure — the record alone now distinguishes
  a lone stall (third run agrees with the fast one) from genuine
  bimodality (r8: 197 vs 214 s suite drift on identical code).
  Expected band on this VM: median ~1.0-1.3x.
* Budget fallbacks degrade visibly, never silently: past
  SPARK_GRAFT_REPEAT_BUDGET the second run is skipped (entry records
  run 1 and lands in "single_run"); past SPARK_GRAFT_BENCH_BUDGET
  remaining entries record -2.0 ("skipped"). Per-run hangs are
  cancelled after SPARK_GRAFT_QUERY_BUDGET and record -1.0.
* Band-suspect self-labeling (round 11, function-level since round
  12): every entry whose reported min exceeds the newest committed
  BENCH_r*.json figure by >2x is checked against the git diff since
  that bench's commit. If NO KNOWN CODE PATH feeding the query
  changed, the entry is labeled "band_suspect" — this VM's roaming
  stall bands (BENCH_NOTES variance tables) are the best remaining
  explanation (session/env config drift is outside what git can see,
  which is why the label is "suspect", not proof). Attribution is
  function-level for package modules (round 12: an untouched query
  in a touched FILE no longer blocks on the file — the changed
  top-level defs AND single-name module constants are diffed via ast
  and intersected with the names the query's source transitively
  reaches; non-named module-level code changes fall back to
  whole-file attribution), verbatim function-source
  membership for queries.py, file-level for foundation modules
  (session/readers/order/text/steps — they feed queries that never
  name them), and includes UNTRACKED package modules. Measurement-
  machinery drift (bench.py's own timing path, the __spark_entry__
  shim) is scanned too and reported in "harness_changed" — it
  applies to every entry at once, so it is recorded alongside the
  per-entry labels rather than nulling them. Entries whose reached
  code DID change are listed with the overlap instead, for human
  adjudication; function-level exonerations are recorded per entry
  under "exonerated". Details in BENCH_LOCAL.json "band_suspects";
  the stdout line carries the names + prior figures.
* Streaming entries get a RESERVED repeat budget (round 12): the
  eight stream_* queries sit late in registry order and were the
  only entries ever degraded to single-run by the repeat budget —
  exactly the entries whose single-run figures caused the r10
  (stream_lsh 61.6 s) and r11 (stream_stream_join 6.55 s)
  adjudication debt, since one streaming drain straddling a stall
  band has no second run to outvote it. They now run min-of-2 up to
  SPARK_GRAFT_STREAM_RESERVE (default 240 s) past each budget line.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from __spark_entry__ import queries  # noqa: E402

from data_transformation_2022_spark.session import get_spark  # noqa: E402

# Per-run cap: one hung execution (a stuck streaming drain, a
# pathological plan) must not eat the suite. On timeout the query's
# jobs/streams are cancelled and the run records failure.
QUERY_TIMEOUT_S = float(os.environ.get("SPARK_GRAFT_QUERY_BUDGET", "120"))

# Soft wall-clock budget for the whole timed loop: this VM has
# multi-minute slow phases (see BENCH_NOTES variance tables); rather
# than risk the whole run being killed with no output, queries past the
# budget are recorded as -2.0 ("skipped, out of budget") and the JSON
# line still prints. Raised from 540 (r3-r7) to 900 for the two-run
# protocol (r7 single-shot loop was ~267 s of query time; two runs of
# everything ~535 s steady, more in a stall phase).
SOFT_BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "900"))

# Past this point the second (measuring) run is skipped and entries
# fall back to their single run-1 figure — still warm-less-cold than
# -2.0, and visibly tagged in "single_run".
REPEAT_BUDGET_S = float(os.environ.get("SPARK_GRAFT_REPEAT_BUDGET", "780"))

# Streaming entries sit late in registry order, so the repeat/soft
# budgets historically degraded exactly them to single-run — the one
# mode this VM's stall bands can't be outvoted in. They get this many
# extra seconds past BOTH budget lines before degrading (see module
# docstring).
STREAM_RESERVE_S = float(os.environ.get("SPARK_GRAFT_STREAM_RESERVE", "240"))

RID_TABLES = ("lineitem", "orders", "documents", "embeddings", "events")

REPO = os.path.dirname(os.path.abspath(__file__))


def _top_level_map(src: str):
    """Parse a module source into (name -> source segment incl.
    decorators) for top-level defs/classes AND single-name module
    constants (``NAME = ...`` / annotated form — named so a changed
    constant attributes per-reach like a changed function instead of
    forcing whole-file fallback), plus the module-level residue
    (everything else, minus the docstring and comment/blank lines).
    Returns None when the source does not parse — callers fall back to
    file-level attribution."""
    import ast

    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    lines = src.splitlines()
    segs: dict[str, str] = {}
    covered: set[int] = set()
    body = tree.body
    if (
        body
        and isinstance(body[0], ast.Expr)
        and isinstance(getattr(body[0], "value", None), ast.Constant)
        and isinstance(body[0].value.value, str)
    ):
        covered.update(range(body[0].lineno - 1, body[0].end_lineno))
    for node in body:
        name = None
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            name = node.name
        elif (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
        ):
            name = node.targets[0].id
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            name = node.target.id
        if name is not None:
            start = min(
                [node.lineno]
                + [d.lineno for d in getattr(node, "decorator_list", [])]
            )
            seg = "\n".join(lines[start - 1 : node.end_lineno])
            # re-assigned names concatenate so no occurrence's change
            # can hide behind the last one
            segs[name] = (segs[name] + "\n" + seg) if name in segs else seg
            covered.update(range(start - 1, node.end_lineno))
    residue = "\n".join(
        ln
        for i, ln in enumerate(lines)
        if i not in covered and ln.strip() and not ln.lstrip().startswith("#")
    )
    return segs, residue


def _changed_fn_map(old_src: str, new_src: str):
    """Function-level diff of two module sources: (changed top-level
    def/class names, module-level-code-changed flag), or None when
    either side fails to parse (caller falls back to file-level)."""
    o = _top_level_map(old_src)
    n = _top_level_map(new_src)
    if o is None or n is None:
        return None
    oseg, ores = o
    nseg, nres = n
    changed = {k for k in set(oseg) | set(nseg) if oseg.get(k) != nseg.get(k)}
    return changed, ores != nres


def _reach_names(seed_src: str, segs: dict[str, str]) -> set[str]:
    """Top-level names of a module transitively referenced starting
    from ``seed_src`` (word-boundary matches, expanded through the
    reached definitions' own sources to a fixpoint). Over-approximates
    on name collisions — the safe direction: a real code change is
    never exonerated by a too-small reach set."""
    hit: set[str] = set()
    frontier = seed_src
    while True:
        new = {
            n
            for n in segs
            if n not in hit and re.search(rf"\b{re.escape(n)}\b", frontier)
        }
        if not new:
            return hit
        hit |= new
        frontier = "\n".join(segs[n] for n in sorted(new))


def _band_suspects(timings: dict[str, float], qs: dict) -> dict:
    """Label >2x regressions vs the newest committed BENCH_r*.json as
    band_suspect when no known code path feeding the query changed
    since that bench (function-level attribution — see module
    docstring). Returns {"suspects": {name: {...}}, "harness_changed":
    [...]}. Never raises — a bench must not die on a git/IO hiccup; on
    any failure it returns {}."""
    import glob
    import inspect
    import subprocess

    try:
        def _git(*args: str) -> str:
            return subprocess.run(
                ["git", "-C", REPO, *args],
                capture_output=True, text=True, timeout=30,
            ).stdout

        # newest COMMITTED bench record: an uncommitted BENCH_r*.json
        # saved earlier this round has no commit to diff against, so
        # walk newest->oldest until git knows the file
        pf = commit = None
        for cand in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")), reverse=True):
            c = _git("log", "-1", "--format=%H", "--", os.path.basename(cand)).strip()
            if c:
                pf, commit = cand, c
                break
        if pf is None:
            return {}
        with open(pf) as f:
            prior = json.load(f).get("parsed", {}).get("queries", {})
        if not isinstance(prior, dict):
            prior = {}
        prior_src = {k: os.path.basename(pf) for k in prior}
        # the driver record's stdout line inlines only the slowest
        # entries when it overflows — most queries would never be able
        # to self-flag. Fall back to the full committed record
        # (BENCH_LOCAL.json as of the same commit) for the rest.
        try:
            local = json.loads(_git("show", f"{commit}:BENCH_LOCAL.json")).get(
                "queries", {}
            )
        except Exception:
            local = {}
        if isinstance(local, dict):
            for k, v2 in local.items():
                if k not in prior:
                    prior[k] = v2
                    prior_src[k] = "BENCH_LOCAL.json@" + commit[:8]
        if not prior:
            return {}

        pkg = "data_transformation_2022_spark"
        changed_paths = [
            p for p in _git("diff", "--name-only", commit).splitlines()
            if p.startswith(pkg + "/") and p.endswith(".py")
        ]
        # untracked package modules are code the prior bench never ran
        changed_paths += [
            ln[3:]
            for ln in _git("status", "--porcelain", "-uall").splitlines()
            if ln.startswith("?? ")
            and ln[3:].startswith(pkg + "/")
            and ln[3:].endswith(".py")
        ]

        def _read(path: str) -> str:
            try:
                with open(os.path.join(REPO, path)) as fh:
                    return fh.read()
            except OSError:
                return ""

        # function-level diff per changed module (None → file-level)
        fn_changes: dict[str, tuple | None] = {}
        for p in changed_paths:
            stem = os.path.splitext(os.path.basename(p))[0]
            fn_changes[stem] = _changed_fn_map(
                _git("show", f"{commit}:{p}"), _read(p)
            )
        stems = set(fn_changes)
        queries_changed = "queries" in stems
        stems.discard("queries")
        fc_queries = fn_changes.pop("queries", None)
        old_queries_src = (
            _git("show", f"{commit}:{pkg}/queries.py") if queries_changed else ""
        )
        # a changed FOUNDATION module (session/readers/ordering/text
        # helpers) feeds queries that never name it — reach can't be
        # established from the query source, so these stay file-level
        # and are never auto-excused
        foundation = sorted(stems & {"session", "readers", "order", "text", "steps"})

        def _module_src(stem: str) -> str:
            import glob as _g

            globs = (
                [os.path.join(REPO, pkg, "queries.py")]
                if stem == "queries"
                else _g.glob(os.path.join(REPO, pkg, "*", f"{stem}.py"))
                + _g.glob(os.path.join(REPO, pkg, f"{stem}.py"))
            )
            for p in globs:
                try:
                    with open(p) as fh:
                        return fh.read()
                except OSError:
                    pass
            return ""

        seg_cache: dict[str, dict | None] = {}

        def _segs(stem: str) -> dict | None:
            if stem not in seg_cache:
                m = _top_level_map(_module_src(stem))
                seg_cache[stem] = m[0] if m else None
            return seg_cache[stem]

        def _imports_of(src: str) -> set[str]:
            """Module stems a source body IMPORTS (relative imports and
            dotted package references) — not raw substrings, so a stem
            mentioned in a comment/docstring never counts."""
            mods = set(re.findall(r"from\s+\.[\w.]*?(\w+)\s+import", src))
            mods |= set(
                re.findall(
                    r"(?:operators|functions|streaming|plans|ml|sources)\.(\w+)",
                    src,
                )
            )
            return mods

        def _attribute(stem: str, seed_src: str, via: str | None):
            """Overlap entry string when the seed's reach into ``stem``
            touches a changed definition (or attribution must stay
            file-level); None when function-level analysis exonerates
            the stem for this seed."""
            label = stem if via is None else f"{stem} (via {via})"
            fc = fn_changes.get(stem)
            segs = _segs(stem)
            if fc is None or fc[1] or segs is None or not seed_src:
                return label  # file-level: module-level code changed
                # since the prior bench, or a side failed to parse
            hit = sorted(_reach_names(seed_src, segs) & fc[0])
            if hit:
                return f"{label}: {','.join(hit)}"
            return None

        # measurement-machinery drift applies to every entry at once,
        # so it is reported once, beside (not instead of) the labels
        harness_changed: list[str] = []
        fcb = _changed_fn_map(_git("show", f"{commit}:bench.py"), _read("bench.py"))
        if fcb is None:
            harness_changed.append("bench.py")
        else:
            if fcb[1]:
                harness_changed.append("bench.py (module level)")
            harness_changed += [
                f"bench.py:{n}"
                for n in sorted(
                    fcb[0]
                    # top-level names only: _run_once/_min_of_2 are nested
                    # inside main(), so _changed_fn_map can never report
                    # them — drift in them surfaces as "bench.py:main"
                    # (ADVICE r12: the nested entries were dead)
                    & {
                        "main",
                        "QUERY_TIMEOUT_S", "SOFT_BUDGET_S",
                        "REPEAT_BUDGET_S", "STREAM_RESERVE_S", "RID_TABLES",
                    }
                )
            ]
        if _git("diff", "--name-only", commit, "--", "__spark_entry__.py").strip():
            harness_changed.append("__spark_entry__.py")

        out: dict[str, dict] = {}
        for name, v in timings.items():
            p = prior.get(name)
            if not isinstance(p, (int, float)) or p <= 0 or v <= 0 or v <= 2 * p:
                continue
            try:
                src = inspect.getsource(qs[name])
            except Exception:
                src = ""
            imported = _imports_of(src)
            overlap: list[str] = []
            exonerated: list[str] = []

            def _add(stem: str, seed: str, via: str | None = None) -> None:
                e = _attribute(stem, seed, via)
                label = stem if via is None else f"{stem} (via {via})"
                tgt, ent = (overlap, e) if e is not None else (exonerated, label)
                if ent not in tgt:
                    tgt.append(ent)

            direct = sorted(stems & imported)
            for s in direct:
                _add(s, src)
            # one level transitive over the import graph: a query
            # importing operators/dedup regresses when functions/text
            # changed, without 'text' in the query function itself.
            # The reach seed is what the query touches IN the
            # intermediate module (whole module when nothing resolves —
            # the conservative direction).
            for mod in sorted(imported - stems):
                msrc = _module_src(mod)
                for s in sorted(stems & _imports_of(msrc)):
                    if s in direct:
                        continue
                    msegs = _segs(mod)
                    reached = _reach_names(src, msegs) if msegs else set()
                    seed = (
                        "\n".join(msegs[n] for n in sorted(reached))
                        if reached
                        else msrc
                    )
                    _add(s, seed, via=mod)
            for s in foundation:
                if not any(o.split(" ")[0].split(":")[0] == s for o in overlap):
                    overlap.append(f"{s} (foundation)")
            if queries_changed:
                if src and src not in old_queries_src:
                    overlap.append("queries(fn changed)")
                elif fc_queries and src:
                    # helper-level reach within queries.py (module-level
                    # residue there is oracle-SQL templates + the
                    # attestation-prefix list — Spark-timing-neutral by
                    # construction, so residue changes alone don't force
                    # file-level)
                    qsegs = _segs("queries")
                    if qsegs is None:
                        overlap.append("queries (unparseable)")
                    else:
                        own = getattr(qs[name], "__name__", "")
                        hit = sorted(
                            (_reach_names(src, qsegs) & fc_queries[0]) - {own}
                        )
                        if hit:
                            overlap.append(f"queries: {','.join(hit)}")
                        else:
                            exonerated.append("queries (helpers unchanged)")
            out[name] = {
                "prior": p,
                "prior_file": prior_src.get(name, os.path.basename(pf)),
                "min": v,
                "changed_overlap": overlap,
                "exonerated": exonerated,
                "band_suspect": not overlap,
            }
        return {"suspects": out, "harness_changed": harness_changed}
    except Exception:
        return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    qs = queries()

    # streaming scopes temporarily pin spark.sql.shuffle.partitions; a
    # run abandoned mid-timeout could leave the session at the
    # streaming value, so the relational default is re-pinned after
    # every cancellation (and once up front).
    shuffle_parts = os.environ.get(
        "SPARK_SHUFFLE_PARTITIONS", str(max(8, os.cpu_count() or 8))
    )

    def _pin_shuffle() -> None:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)

    _pin_shuffle()

    from data_transformation_2022_spark.queries import build_persisted_ivf
    from data_transformation_2022_spark.sources.readers import load_table

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    single_run: list[str] = ["ingest_rid_tables"]
    spreads: dict[str, float] = {}
    spread_flags: list[str] = []

    def _run_once(fn, label: str) -> tuple[float, str | None]:
        """Execute ``fn`` in a guarded thread; returns (elapsed_s, None)
        on success, (inf, reason) on error/timeout. Timeout cancels all
        jobs + active streams and re-pins shuffle partitions."""
        err: list[str] = []

        def _guarded():
            try:
                fn()
            except Exception as e:
                err.append(f"{type(e).__name__}: {e}")

        t0 = time.time()
        th = threading.Thread(target=_guarded, daemon=True)
        th.start()
        th.join(QUERY_TIMEOUT_S)
        if th.is_alive():
            print(f"BENCH_TIMEOUT {label}: cancelling", file=sys.stderr)
            for s in spark.streams.active:
                try:
                    s.stop()
                except Exception:
                    pass
            spark.sparkContext.cancelAllJobs()
            th.join(10)
            _pin_shuffle()
            return float("inf"), "timeout"
        if err:
            print(f"BENCH_RUN_ERROR {label}: {err[0][:300]}", file=sys.stderr)
            _pin_shuffle()
            return float("inf"), err[0]
        return time.time() - t0, None

    def _min_of_2(name: str, fn, start: float, reserve: bool = False) -> None:
        """Two adjacent executions, record the min; degrade visibly on
        error/timeout/budget (see module docstring). ``reserve``
        (streaming entries) extends the repeat budget by
        STREAM_RESERVE_S so late-in-suite streaming drains are never
        degraded to single-run — the one mode a stall band can't be
        outvoted in (r10 stream_lsh 61.6 s, r11 stream_stream_join
        6.55 s)."""
        repeat_budget = REPEAT_BUDGET_S + (STREAM_RESERVE_S if reserve else 0)
        r1, e1 = _run_once(fn, f"{name}#1")
        if e1 is not None:
            timings[name] = -1.0
            print(f"BENCH_ERROR {name}: {e1[:200]}", file=sys.stderr)
            return
        if time.time() - start > repeat_budget:
            timings[name] = round(r1, 3)
            runs[name] = [round(r1, 3)]
            single_run.append(name)
            print(f"BENCH_OK {name}: {timings[name]}s (single, repeat budget)",
                  file=sys.stderr)
            return
        r2, e2 = _run_once(fn, f"{name}#2")
        if e2 is not None:
            # One bounded retry before falling back to a single-run
            # figure: a run-2 timeout on a query whose run 1 completed
            # is this VM's stall-band signature (r10: stream_lsh run 1
            # 61.6s, run 2 timeout → published single-run), and a third
            # attempt usually lands outside the stall. Only if IT also
            # fails does the entry degrade to single_run.
            if time.time() - start <= repeat_budget:
                r2, e2 = _run_once(fn, f"{name}#2retry")
            if e2 is not None:
                timings[name] = round(r1, 3)
                runs[name] = [round(r1, 3)]
                single_run.append(name)
                print(f"BENCH_OK {name}: {timings[name]}s (single, run2 {e2[:80]})",
                      file=sys.stderr)
                return
        rs = [r1, r2]
        # pair-spread guard (r9): runs differing >2x mark a VM-stall-
        # suspect pair. r10 (ADVICE): instead of leaving the flag for a
        # human to adjudicate, spend ONE bounded extra run on exactly
        # the flagged entries — with 3 samples a single stall is
        # outvoted (the two clean runs agree) and the recorded spread
        # is computed over the two FASTEST runs, which is the
        # comparable round-over-round statistic.
        if (
            max(rs) / min(rs) > 2.0
            and min(rs) > 0
            and time.time() - start <= repeat_budget
        ):
            r3, e3 = _run_once(fn, f"{name}#3")
            if e3 is None:
                rs.append(r3)
        timings[name] = round(min(rs), 3)
        runs[name] = [round(r, 3) for r in rs]
        fastest2 = sorted(rs)[:2]
        spread = (fastest2[1] / fastest2[0]) if fastest2[0] > 0 else float("inf")
        spreads[name] = round(spread, 2)
        if spread > 2.0:
            spread_flags.append(name)
            print(f"BENCH_SPREAD {name}: runs {runs[name]} spread "
                  f"{spread:.1f}x (>2x even over the two fastest of "
                  f"{len(rs)}: not a lone stall)", file=sys.stderr)
        print(f"BENCH_OK {name}: {timings[name]}s (runs {runs[name]})",
              file=sys.stderr)

    # Setup (IVF build + rid ingest) runs on its own clock: the suite
    # budgets cover the TIMED QUERY LOOP only, as in rounds 3-7 — a
    # slow setup phase must not push tail queries into skip/single-run
    # fallbacks and skew the round-over-round comparison.
    setup_start = time.time()

    # Build the persisted IVF index up front (min-of-2, force_rebuild on
    # both runs so neither amortizes the build), so the
    # sim_ivf_persisted entry below measures serving, not building.
    _min_of_2(
        "ivf_index_build",
        lambda: build_persisted_ivf(spark, sf_dir, force_rebuild=True),
        setup_start,
    )

    # tables ingest in parallel, as a warehouse load would: each rid
    # build is its own job chain (boundaries → bucket counts → window),
    # and the scheduler interleaves them across the executor pool —
    # same total work, ~2x less wall time than the sequential loop
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=len(RID_TABLES)) as pool:
        list(
            pool.map(
                lambda t: load_table(spark, sf_dir, t, rid=True).count(),
                RID_TABLES,
            )
        )
    timings["ingest_rid_tables"] = round(time.time() - t0, 3)
    print(f"BENCH_OK ingest_rid_tables: {timings['ingest_rid_tables']}s",
          file=sys.stderr)

    # streaming entries sit late in registry order; they carry the
    # reserved repeat budget (module docstring)
    try:
        from data_transformation_2022_spark.queries import REGISTRY

        reserve_names = {
            n for n, qd in REGISTRY.items() if "streaming" in qd.tags
        }
    except Exception:
        reserve_names = {n for n in qs if n.startswith("stream_")}

    start = time.time()  # query-loop budget clock starts AFTER setup
    for name in qs:
        reserve = name in reserve_names
        soft = SOFT_BUDGET_S + (STREAM_RESERVE_S if reserve else 0)
        if time.time() - start > soft:
            timings[name] = -2.0
            print(f"BENCH_SKIP {name}: out of {soft}s budget",
                  file=sys.stderr)
            continue

        def _fn(name=name):
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

        _min_of_2(name, _fn, start, reserve=reserve)

    band_out = _band_suspects(timings, qs)
    band_suspects = band_out.get("suspects", {})
    harness_changed = band_out.get("harness_changed", [])
    total = round(sum(v for v in timings.values() if v >= 0), 3)
    n_ok = sum(1 for v in timings.values() if v >= 0)
    n_error = sum(1 for v in timings.values() if v == -1.0)
    n_skipped = sum(1 for v in timings.values() if v == -2.0)
    n_min2 = sum(1 for k in timings if k not in single_run and timings[k] >= 0)
    svals = sorted(spreads.values())
    spread_stats: dict = {"n_flagged": len(spread_flags)}
    if svals:
        spread_stats["median"] = svals[len(svals) // 2]
        spread_stats["max"] = svals[-1]
        # ceil-rank p90, and only when n is large enough for it to
        # differ from max (the old int(n*0.9) nearest-rank collapsed to
        # max for small n, overstating tail spread — ADVICE r9)
        if len(svals) >= 10:
            spread_stats["p90"] = svals[math.ceil(0.9 * len(svals)) - 1]
    full = {
        "metric": "end_to_end_query_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "sf": sf,
        "n_ok": n_ok,
        "n_error": n_error,
        "n_skipped": n_skipped,
        "n_min2": n_min2,
        "single_run": single_run,
        "band_suspects": band_suspects,
        "harness_changed": harness_changed,
        "spreads": spreads,
        "spread_flags": sorted(spread_flags),
        "spread_stats": spread_stats,
        # Self-describing record (ADVICE r9): these entries share a
        # (data, rule, params)-memoized model fit (the classifier's
        # functions/text._FIT_CACHE; since r12 also the PPMI-SVD
        # embeddings' _PPMI_CACHE), so any run after the first fit —
        # including run 2 of min-of-2 and every later consumer — is a
        # warm-fit measurement, not comparable to pre-round-9 cold-fit
        # numbers for the fit-bearing entry.
        "warm_fit": sorted(
            q
            for q in (
                "corpus_source_quality",
                "corpus_quality_classifier",
                "corpus_classifier_eval",
                "pipeline_curate_corpus",
                "corpus_embedding_neighbors",
            )
            if q in timings
        ),
    }
    # Durable copy: the one-line stdout JSON is captured by the driver as a
    # bounded TAIL, and ~100 query entries overflowed it in round 2 (front
    # of the line truncated → unparseable). The full result always lands in
    # a file next to this script; the printed line is kept under the
    # capture window by inlining only the slowest queries if needed.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    slim = {k: v for k, v in full.items() if k not in ("runs", "spreads")}
    # stdout line: compact {name: [prior, min]} for true suspects only;
    # full records (incl. changed-code overlaps) stay in BENCH_LOCAL.json
    slim["band_suspects"] = {
        n: [d["prior"], d["min"]]
        for n, d in band_suspects.items()
        if d["band_suspect"]
    }
    slim["runs_full"] = "BENCH_LOCAL.json"
    line = json.dumps(slim, separators=(",", ":"))
    if len(line) > 1600:
        slowest = dict(
            sorted(
                ((k, v) for k, v in timings.items() if v >= 0),
                key=lambda kv: -kv[1],
            )
        )
        inline: dict[str, float] = {}
        base = dict(slim, queries=inline, queries_full="BENCH_LOCAL.json")
        base["single_run"] = len(single_run)
        # distinct key, not a type-morphing overwrite: consumers of the
        # stdout line can rely on "spread_flags" always being a list
        # (when present) and "n_spread_flags" always being a count
        del base["spread_flags"]
        base["n_spread_flags"] = len(spread_flags)
        for k, v in slowest.items():
            inline[k] = v
            if len(json.dumps(base, separators=(",", ":"))) > 1500:
                del inline[k]
                break
        line = json.dumps(base, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
