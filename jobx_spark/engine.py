"""The execution engine: map → combine → reduce with dynamic fan-out.

Re-expresses the reference's job lifecycle (mr/job_engine.py — queue
hops, etcd datasets, CAS counters) as a driver-side recursion over
Spark DataFrames:

  * an **invocation** is a group key, not a queue message: one step's
    mapper+combiner+reducer run inside a single Arrow-batched
    ``applyInPandas`` over ``groupBy(invocation_id)`` — one shuffle per
    step instead of the reference's one queue message + etcd dataset
    *per yielded pair* (its self-documented scheduling cliff,
    mr/job_engine.py:349-358);
  * dynamic fan-out (``MrConfigureToMap`` — mr/job_engine.py:330-386)
    re-keys each yielded pair to a derived child invocation id and
    recurses in the driver (the Pregel pattern): millions of child
    invocations are rows, not tasks;
  * the hierarchical fold-up (mr/job_engine.py:689-819: union children →
    regroup by key → parent reducer) is a second ``applyInPandas`` per
    level; Spark's hash aggregation spills where the reference's
    in-memory dict regroup "has a high [memory] cost for large sets"
    (mr/job_engine.py:772-775);
  * sessions ride the same DataFrames as ``row_type='session'`` rows and
    meet their reducer through a cogroup — no driver-sized state.

Values are JSON-encoded strings end-to-end — the reference's loose JSON
typing (mr/config/kv.py:12-13) inside a fixed Spark schema.

Determinism: handler RNG is seeded from the invocation id before every
handler call (the reference's handlers are free-running RNG; seeding is
a deliberate deviation so results are golden-hashable — FIXTURES.md A.4).
"""

from __future__ import annotations

import hashlib
import json
import threading
import time
import traceback
import uuid
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobx_spark.catalog import Catalog, Handler, Step
from jobx_spark.handlers import (
    HandlerScope,
    MrConfigureToMap,
    MrConfigureToReturn,
    compile_source_handler,
    parse_docstring_metadata,
)
from jobx_spark import result_writers
from jobx_spark.trace import INVOCATION_CAP, InvocationRecord, RequestTrace

# unified row schema for every engine dataset
_ROWS_SCHEMA = (
    "row_type string, inv string, parent_inv string, step string, "
    "seq long, k string, v string"
)

_MAX_DEPTH = 32

# submit_dataset's distributed sinks: folded results written in parallel
# by the executors (same writer contracts as jobx_spark/sources/sinks.py),
# never collect()ed. The driver-side writers (inline/file/http/email)
# remain for small results and reference parity (mr/result_writers/*).
_DATASET_SINKS = {
    "parquet": lambda df, path, **kw: df.write.mode("overwrite").parquet(path, **kw),
    "csv": lambda df, path, **kw: df.write.mode("overwrite")
    .option("header", "true")
    .csv(path, **kw),
    "json": lambda df, path, **kw: df.write.mode("overwrite").json(path, **kw),
}
_DATASET_READERS = {
    "parquet": lambda spark, path: spark.read.parquet(path),
    "csv": lambda spark, path: spark.read.schema(_ROWS_RESULT_SCHEMA)
    .option("header", "true")
    .csv(path),
    "json": lambda spark, path: spark.read.schema(_ROWS_RESULT_SCHEMA).json(path),
}
_ROWS_RESULT_SCHEMA = "seq long, k string, v string"


class HandlerInvocationError(RuntimeError):
    """Carries (step, invocation, traceback) back to the driver — the
    engine's version of the reference's error stamping
    (mr/job_engine.py:535-572)."""


@dataclass
class Request:
    request_id: str
    workflow_name: str
    job_name: str
    context: dict | None
    is_blocking: bool
    is_done: bool = False
    error: str | None = None
    failed_invocation_id: str | None = None
    result: dict | None = None
    # distributed result path (submit_dataset with a table sink): the
    # folded output as a DataFrame read back from the sink — table-scale
    # results never transit the driver.
    result_df: DataFrame | None = None
    created_at: float = field(default_factory=time.time)
    finished_at: float | None = None
    trace: RequestTrace | None = None

    def wait(self, timeout: float | None = None) -> "Request":
        deadline = None if timeout is None else time.time() + timeout
        while not self.is_done:
            if deadline and time.time() > deadline:
                raise TimeoutError(f"request {self.request_id} still running")
            time.sleep(0.05)
        return self


def _encode(obj) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


def _decode(s: str):
    return json.loads(s)


def _seeded_random(*parts: str):
    import random

    random.seed(":".join(parts))


def _call_handler(handler: Handler, scope: HandlerScope, payload):
    """Invoke a handler: plain callables get (scope, payload); source
    handlers get the reference's injected-globals convention."""
    if handler.fn is not None:
        return handler.fn(scope, payload)
    arg_name = "arguments" if handler.handler_type == "mapper" else "results"
    compiled = compile_source_handler(handler.name, [arg_name], handler.source_code)
    return compiled(scope.scope_dict(), payload)


def _default_combine(pairs: list[tuple[str, str]]):
    """The reference's default combiner: sort pairs, group by key, do NOT
    flatten value lists (mr/job_engine.py:275-313, no-flatten note
    :396-404). Operates on JSON-encoded pairs; sort order is the
    encoded-string order (deterministic across engines/runs)."""
    out: list[tuple[str, list]] = []
    for ek, ev in sorted(pairs):
        if out and out[-1][0] == ek:
            out[-1][1].append(_decode(ev))
        else:
            out.append((ek, [_decode(ev)]))
    return [(_decode(ek), vl) for ek, vl in out]


def _run_reduce(
    step_plan: dict, inv: str, parent_inv: str, grouped, session_snapshot: dict
) -> list[tuple]:
    """Run the user reducer; emit engine rows. Session writes are locked
    out (reference: allow_session_writes=False, mr/job_engine.py:795-800)."""
    reducer: Handler = step_plan["reducer"]
    scope = HandlerScope(
        inv, session_snapshot=session_snapshot, allow_session_writes=False,
        workdir=step_plan.get("workdir"),
        extra=step_plan.get("scope_values"),
    )
    _seeded_random(inv, "reduce")
    rows = []
    try:
        for i, (k, v) in enumerate(_call_handler(reducer, scope, iter(grouped))):
            rows.append(
                ("reduced", inv, parent_inv, step_plan["name"], i, _encode(k), _encode(v))
            )
    except Exception:
        raise HandlerInvocationError(
            f"JOBX_HANDLER_ERROR step={step_plan['name']} inv={inv} "
            f"phase=reduce\n{traceback.format_exc()}"
        ) from None
    return rows


# Per-invocation fan-out width cap for in-task subtree fusion: one
# invocation yielding more pairs than this falls back to distributed
# child rows so a single skewed fan-out never serializes inside one
# task (~76 µs/invocation → ~1.2 s of serial work at the cap).
FUSE_MAX_CHILDREN = 16384


def _make_phase1_udf(
    step_plan: dict, workdir: str | None, emit_forensics: bool = False,
    plans: dict | None = None, depth: int = 0, fuse_max: int | None = None,
):
    """Bucket UDF: each Arrow group carries MANY invocations (the
    frontier is grouped by a hash bucket of the invocation id, not by
    the id itself), and the per-invocation semantics — seeded RNG,
    session scope, routing, combine/reduce — run in a loop inside the
    batch. Grouping by raw invocation id would make a 1M-pair fan-out
    into 1M pandas groups (the reference's one-message-per-pair cliff
    reappearing as per-group Python overhead); bucketing amortizes the
    Arrow/pandas cost over the whole batch while keeping 1 pair = 1
    invocation observable semantics (ids, sessions, forensics).

    With ``plans`` (the workflow's full step-plan table), a fan-out
    subtree is FUSED into this pass (guide §1.2-1, §2.4): every child
    invocation is single-pair by construction (child id = sha1(inv:i)
    over this invocation's own yields), so its arguments are already
    task-local and the child's map→combine→reduce plus this
    invocation's fold need no exchange at all. The driver enables
    fusion per level only when the frontier holds enough invocations
    to keep every core busy from the PARENT level (see _run_step)."""

    def phase1(pdf: pd.DataFrame) -> pd.DataFrame:
        # One global (inv, seq) sort + numpy boundary slicing instead of
        # pandas groupby(inv) → per-group sort_values(seq): a wide
        # fan-out makes invocations per-PAIR, and constructing a pandas
        # sub-frame per invocation cost tens of µs × |pairs| — the
        # dominant phase-1 cost at 100k+ invocations (guide §4.2: keep
        # the per-batch Python vectorized, spend the per-row budget in
        # the handler itself). Group order and within-group seq order
        # are what groupby(sort=True) produced; seq ties carry
        # bit-identical rows either way.
        import heapq

        import numpy as np

        pdf = pdf.sort_values(["inv", "seq"])
        invs = pdf["inv"].to_numpy()
        pinvs = pdf["parent_inv"].to_numpy()
        rts = pdf["row_type"].to_numpy()
        seqs = pdf["seq"].to_numpy()
        ks = pdf["k"].to_numpy()
        vs = pdf["v"].to_numpy()
        starts = np.nonzero(np.concatenate(([True], invs[1:] != invs[:-1])))[0]
        bounds = np.append(starts, len(invs))
        rows: list[tuple] = []
        fcands: list[tuple] = []
        trans: set[tuple] = set()
        for s, e_ in zip(bounds[:-1], bounds[1:]):
            out, side, fc, tr = _phase1_one_invocation(
                step_plan, workdir, invs[s], pinvs[s],
                rts[s:e_], seqs[s:e_], ks[s:e_], vs[s:e_],
                plans=plans, depth=depth, want_forensics=emit_forensics,
                fuse_max=fuse_max,
            )
            rows.extend(out)
            rows.extend(side)
            fcands.extend(fc)
            trans |= tr
        # Forensics ride phase 1 (guide §1.2-1: don't recompute what an
        # existing pass already knows): each invocation's record —
        # argument count, ≤3-pair sample ordered by (seq, k, v), child/
        # reduced output counts — is emitted as ONE extra 'forensic'
        # row, replacing the driver-side distinct + full-frontier
        # window + two-aggregate join jobs that re-derived the same
        # facts from the persisted frames. The 512-record cap makes a
        # per-(step, depth)-per-batch budget sound: the globally
        # smallest CAP+1 inv ids of a step are a subset of each batch's
        # smallest CAP+1, so the driver's TakeOrdered over these rows
        # sees every record it can keep. seq carries the invocation's
        # absolute fan-out depth so the driver can capture per
        # (step, depth) node in the fused output.
        if emit_forensics and fcands:
            by_node: dict[tuple, list] = {}
            for c in fcands:
                by_node.setdefault((c[0], c[1]), []).append(c)
            for cs in by_node.values():
                for stp, dep, inv, pinv, counts, sample in heapq.nsmallest(
                    INVOCATION_CAP + 1, cs, key=lambda c: c[2]
                ):
                    rows.append(("forensic", inv, pinv, stp, dep, counts, sample))
        # one 'traceev' marker per fused fan-out transition per batch
        # (bounded by steps × depth): the driver reconstructs the
        # step-level trace events and per-node captures from these.
        for pstep, cstep, cdep in sorted(trans):
            rows.append(("traceev", "", pstep, cstep, cdep, None, None))
        return pd.DataFrame(
            rows,
            columns=["row_type", "inv", "parent_inv", "step", "seq", "k", "v"],
        )

    return phase1


def _forensic_candidate(
    step_name: str, depth: int, inv, parent_inv, seqs, ks, vs,
    n_mapped: int, n_reduced: int,
) -> tuple:
    """(step, depth, inv, parent_inv, counts_json, sample_json) — the
    invocation's forensic record. Sample = ≤3 argument pairs ordered by
    (seq ASC, k ASC, v ASC) NULLS FIRST, exactly the window ordering
    the pre-r12 driver-side sample used (arg_empty sentinel rows carry
    NULL k/v)."""
    import heapq

    sample = heapq.nsmallest(
        3,
        zip((int(x) for x in seqs), ks, vs),
        key=lambda t: (
            t[0],
            t[1] is not None,
            t[1] or "",
            t[2] is not None,
            t[2] or "",
        ),
    )
    counts = {
        "n_args": len(seqs),
        "n_mapped": n_mapped,
        "n_reduced": n_reduced,
    }
    return (
        step_name, depth, inv, parent_inv,
        _encode(counts), _encode([[k, v] for _, k, v in sample]),
    )


def _phase1_one_invocation(
    step_plan: dict, workdir: str | None, inv, parent_inv,
    row_types, seqs, ks, vs,
    plans: dict | None = None, depth: int = 0, want_forensics: bool = False,
    fuse_max: int | None = None,
) -> tuple[list[tuple], list[tuple], list[tuple], set[tuple]]:
    """One invocation's mapper → routing → (leaf: combine+reduce
    in-place | fan-out: fused subtree when possible, else child rows).
    Takes the invocation's rows as seq-presorted parallel arrays — the
    bucket UDF slices them out of its one batch-wide sort (a pandas
    sub-frame per invocation would cost tens of µs × invocations).

    Returns ``(out_rows, side_rows, forensic_candidates, transitions)``:
    out_rows are this invocation's result rows ('reduced' for a leaf or
    a fused fold, 'child' rows on the distributed-fallback path);
    side_rows are 'session' rows of every fan-out invocation in the
    fused subtree; forensic_candidates are unbudgeted per-invocation
    records (the batch wrapper applies the CAP+1 budget); transitions
    are (parent_step, child_step, child_depth) fan-out edges taken by
    fused recursion (the driver rebuilds trace events from them)."""
    # 'arg_empty' sentinel: a zero-argument invocation still runs its
    # mapper exactly once (parity with the reference, which enumerates
    # an empty DT_ARGUMENTS dataset).
    args = [
        (_decode(k), _decode(v))
        for t, k, v in zip(row_types, ks, vs)
        if t != "arg_empty"
    ]
    scope = HandlerScope(
        inv, allow_session_writes=True, workdir=workdir,
        extra=step_plan.get("scope_values"),
    )
    _seeded_random(inv, "map")
    rows: list[tuple] = []
    side: list[tuple] = []
    fcands: list[tuple] = []
    trans: set[tuple] = set()
    n_mapped = n_reduced = 0
    try:
        gen = _call_handler(step_plan["mapper"], scope, iter(args))
        route = next(gen)
        pairs = [(_encode(k), _encode(v)) for k, v in gen]
    except Exception:
        raise HandlerInvocationError(
            f"JOBX_HANDLER_ERROR step={step_plan['name']} inv={inv} "
            f"phase=map\n{traceback.format_exc()}"
        ) from None

    if isinstance(route, MrConfigureToReturn):
        if step_plan["combiner"] is not None:
            cscope = HandlerScope(
                inv, session_snapshot=scope.session_snapshot(),
                extra=step_plan.get("scope_values"),
            )
            _seeded_random(inv, "combine")
            try:
                grouped = list(
                    _call_handler(
                        step_plan["combiner"],
                        cscope,
                        iter((_decode(k), _decode(v)) for k, v in pairs),
                    )
                )
            except Exception:
                raise HandlerInvocationError(
                    f"JOBX_HANDLER_ERROR step={step_plan['name']} inv={inv} "
                    f"phase=combine\n{traceback.format_exc()}"
                ) from None
        else:
            grouped = _default_combine(pairs)
        rows.extend(
            _run_reduce(step_plan, inv, parent_inv, grouped, scope.session_snapshot())
        )
        n_reduced = len(rows)
    elif isinstance(route, MrConfigureToMap):
        # session rows are only needed on the fan-out path (the leaf
        # path consumed them in-UDF above); emitting them here keeps
        # the fold cogroup free of spurious leaf session groups. seq
        # carries the fan-out depth for per-node driver capture.
        next_step = route.next_step_name
        n_mapped = len(pairs)
        for key, val in scope.session_writes().items():
            side.append(("session", inv, parent_inv, step_plan["name"], depth, key, val))
        child_plan = (plans or {}).get(next_step)
        fused = False
        if (
            child_plan is not None
            and depth + 1 <= _MAX_DEPTH
            and len(pairs) <= (FUSE_MAX_CHILDREN if fuse_max is None else fuse_max)
        ):
            # Fused subtree (guide §1.2-1/§2.4): every child is a
            # single-pair invocation whose arguments are in hand, so
            # run map→combine→reduce for each child HERE and fold the
            # results with this step's reducer in-task — the child
            # exchange, the fold exchange and the parent-stamp join all
            # disappear. Numerics are identical: the same seeded-RNG
            # discipline runs before every handler call, child ids are
            # the same sha1 derivation, and the fold consumes the same
            # _default_combine(child reduced pairs) + session-writes
            # dict the driver-side cogroup fold consumed. If any
            # descendant cannot complete in-task (unknown step or the
            # depth cap — the driver recursion then reports the exact
            # legacy error), the subtree's speculative output is
            # discarded and plain child rows are emitted instead;
            # handlers are deterministic under the engine's seeding
            # contract (Spark task retries already re-run them), so
            # the discard is safe.
            fused = True
            child_pairs: list[tuple] = []
            c_side: list[tuple] = []
            c_fcands: list[tuple] = []
            c_trans: set[tuple] = set()
            for i, (ek, ev) in enumerate(pairs):
                child = hashlib.sha1(f"{inv}:{i}".encode()).hexdigest()
                c_out, cs, cf, ct = _phase1_one_invocation(
                    child_plan, workdir, child, inv,
                    ("arg",), (0,), (ek,), (ev,),
                    plans=plans, depth=depth + 1,
                    want_forensics=want_forensics, fuse_max=fuse_max,
                )
                if any(r[0] == "child" for r in c_out):
                    fused = False
                    break
                child_pairs.extend((r[5], r[6]) for r in c_out if r[0] == "reduced")
                c_side.extend(cs)
                c_fcands.extend(cf)
                c_trans |= ct
            if fused:
                grouped = _default_combine(child_pairs)
                rows.extend(
                    _run_reduce(
                        step_plan, inv, parent_inv, grouped,
                        scope.session_writes(),
                    )
                )
                side.extend(c_side)
                fcands.extend(c_fcands)
                trans |= c_trans
                trans.add((step_plan["name"], next_step, depth + 1))
        if not fused:
            for i, (ek, ev) in enumerate(pairs):
                child = hashlib.sha1(f"{inv}:{i}".encode()).hexdigest()
                rows.append(("child", child, inv, next_step, 0, ek, ev))
    else:
        raise HandlerInvocationError(
            f"JOBX_HANDLER_ERROR step={step_plan['name']} inv={inv} "
            f"phase=map\nfirst yield must be a routing token, got {route!r}"
        )
    if want_forensics:
        fcands.append(
            _forensic_candidate(
                step_plan["name"], depth, inv, parent_inv, seqs, ks, vs,
                n_mapped, n_reduced,
            )
        )
    return rows, side, fcands, trans



def _make_fold_udf(step_plan: dict):
    """Reduce-over-children: merge-group the concatenated child results
    by key, then the parent step's reducer (mr/job_engine.py:689-819).
    Cogrouped with the parent mapper's session rows."""

    def fold(key, results_pdf: pd.DataFrame, sessions_pdf: pd.DataFrame) -> pd.DataFrame:
        inv = key[0]
        pairs = list(zip(results_pdf["k"], results_pdf["v"]))
        grouped = _default_combine(pairs)  # dict-regroup parity, sorted
        sessions = dict(zip(sessions_pdf["k"], sessions_pdf["v"]))
        rows = _run_reduce(step_plan, inv, None, grouped, sessions)
        return pd.DataFrame(
            rows,
            columns=["row_type", "inv", "parent_inv", "step", "seq", "k", "v"],
        )

    return fold


class Engine:
    """Facade: catalog CRUD + request submission (the Spark stand-in for
    the reference's HTTP API + CLI scripts, mr/views/job.py:33)."""

    def __init__(
        self, spark: SparkSession, workdir: str | None = None,
        catalog: Catalog | None = None, capture_forensics: bool = True,
    ):
        self.spark = spark
        self.catalog = catalog or Catalog()
        self.workdir = workdir
        # Invocation forensics add one extra groupBy/join/collect Spark
        # job per step per submit. Default on for reference parity
        # (trace/graph endpoints); turn off for hot submit paths where
        # the per-step latency matters more than forensics.
        self.capture_forensics = capture_forensics
        # Minimum frontier width (invocations) for in-task subtree
        # fusion; None = 2 × defaultParallelism (scale-adaptive: a
        # narrow frontier keeps the distributed recursion so fan-out
        # parallelism is preserved; a wide one fuses child/fold
        # exchanges away). Tests pin both paths by setting this.
        self.fuse_min_invocations: int | None = None
        self._requests: dict[str, Request] = {}
        # The HTTP API serves from ThreadingHTTPServer: a DELETE
        # (cleanup_request) can race a concurrent list/find iterating
        # the same dict and raise "dictionary changed size during
        # iteration" (ADVICE r5). Registry mutations and snapshots go
        # through this lock; Request objects themselves stay lock-free
        # (single-writer per request).
        self._requests_lock = threading.Lock()

    # ---------------------------------------------------------------- CRUD
    def create_workflow(
        self, name: str, description: str = "", scope_values: dict | None = None
    ):
        """scope_values: workflow-scoped extras injected into every
        handler scope (reference: WorkflowScopeFactory,
        mr/config/handler.py:27-31)."""
        return self.catalog.create_workflow(name, description, scope_values)

    def register_handler(
        self,
        workflow_name: str,
        name: str,
        fn=None,
        source_code: str | None = None,
        handler_type: str | None = None,
        argument_spec: list | None = None,
        required_capability: str | None = None,
    ) -> Handler:
        """Register a callable (fn(scope, arguments|results) generator)
        or reference-style source code with docstring metadata."""
        if source_code is not None and handler_type is None:
            meta = parse_docstring_metadata(source_code)
            handler_type = meta["handler_type"]
            argument_spec = argument_spec or meta["argument_spec"]
            required_capability = required_capability or meta.get("required_capability")
        if fn is not None:
            _ensure_fn_ships(fn)
        h = Handler(
            workflow_name=workflow_name,
            name=name,
            handler_type=handler_type,
            fn=fn,
            source_code=source_code,
            argument_spec=argument_spec or [],
            required_capability=required_capability,
        )
        return self.catalog.register_handler(h)

    def create_step(self, workflow_name, name, map_handler_name,
                    reduce_handler_name, combine_handler_name=None,
                    description=""):
        return self.catalog.create_step(
            workflow_name, name, map_handler_name, reduce_handler_name,
            combine_handler_name, description,
        )

    def create_job(self, workflow_name, name, initial_step_name, description=""):
        return self.catalog.create_job(
            workflow_name, name, initial_step_name, description
        )

    # ------------------------------------------------------------- execute
    def _step_plan(self, step: Step) -> dict:
        wf = step.workflow_name
        return {
            "name": step.name,
            "workdir": self.workdir,
            "scope_values": self.catalog.get_workflow(wf).scope_values,
            "mapper": self.catalog.get_handler(wf, step.map_handler_name),
            "combiner": (
                self.catalog.get_handler(wf, step.combine_handler_name)
                if step.combine_handler_name
                else None
            ),
            "reducer": self.catalog.get_handler(wf, step.reduce_handler_name),
        }

    def _capture_invocations(
        self, map_out: DataFrame,
        trace: RequestTrace | None, depth: int, step_name: str,
    ) -> None:
        """Forensic capture: one record per invocation at this (step,
        depth) node — parent edge, dataset sizes, a ≤3-pair argument
        sample. The aggregation runs on the executors (map_out is
        already persisted, so this reads cache, not the source); only
        the capped record set transits to the driver (the reference
        stores full per-invocation datasets in etcd,
        mr/models/kv/invocation.py — at 100 TB the cap is what keeps
        forensics from becoming a driver OOM)."""
        if (
            not self.capture_forensics
            or trace is None
            or len(trace.invocations) >= INVOCATION_CAP
        ):
            return
        room = INVOCATION_CAP - len(trace.invocations)
        # Phase 1 already emitted one 'forensic' row per invocation
        # (per-(step, depth)-per-batch budgeted at CAP+1, so the
        # globally-smallest room+1 inv ids of this node are all
        # present — see _make_phase1_udf): the capture is ONE
        # TakeOrdered collect over the persisted map_out, replacing
        # the distinct-ids job + full-frontier rank-window sample +
        # two-aggregate join job that re-derived the same facts the
        # phase-1 loop had in hand (guide §1.2-1). A fused run's
        # map_out carries several (step, depth) nodes; seq holds the
        # depth, so each node's capture filters to exactly its rows.
        rows = (
            map_out.filter(
                (F.col("row_type") == "forensic")
                & (F.col("step") == step_name)
                & (F.col("seq") == depth)
            )
            .orderBy("inv")
            .limit(room + 1)
            .collect()
        )
        trace.record_invocations(
            [
                InvocationRecord(
                    inv=r["inv"],
                    parent_inv=r["parent_inv"],
                    step=step_name,
                    depth=depth,
                    arg_sample=[tuple(p) for p in _decode(r["v"])],
                    **_decode(r["k"]),
                )
                for r in rows
            ]
        )

    def _capture_sessions(
        self, map_out: DataFrame, trace: RequestTrace | None,
        depth: int, step_name: str,
    ) -> None:
        """Capture fan-out-path session rows for request inspection
        (reference: mr_get_request_sessions walks every invocation's
        SessionsTree). Same cap/discipline as invocation forensics:
        reads the already-persisted map_out cache, caps before the
        collect. Leaf sessions are consumed mapper→reducer inside one
        task and never materialize — documented deviation."""
        if (
            not self.capture_forensics
            or trace is None
            or len(trace.sessions) >= INVOCATION_CAP
        ):
            return
        room = INVOCATION_CAP - len(trace.sessions)
        rows = (
            map_out.filter(
                (F.col("row_type") == "session")
                & (F.col("step") == step_name)
                & (F.col("seq") == depth)
            )
            .select("inv", "k", "v")
            .orderBy("inv", "k")
            .limit(room + 1)
            .collect()
        )
        trace.record_sessions(
            # session keys are plain strings; values are JSON-encoded
            # by HandlerScope.session_set
            [(r["inv"], step_name, r["k"], _decode(r["v"])) for r in rows]
        )

    def _fuse_plans(self, workflow_name: str, n_invocations: int | None) -> dict | None:
        """The workflow's full step-plan table when subtree fusion is
        on for this frontier, else None. Fusion trades the child/fold
        exchanges for in-task recursion, so it is only right when the
        PARENT level already holds enough invocations to keep every
        core busy (a single wide root would serialize its whole subtree
        into one task); below the threshold the distributed recursion
        is the scalable shape."""
        if n_invocations is None:
            return None
        threshold = self.fuse_min_invocations
        if threshold is None:
            threshold = 2 * self.spark.sparkContext.defaultParallelism
        if n_invocations < threshold:
            return None
        return {
            s.name: self._step_plan(s)
            for s in self.catalog.list_steps(workflow_name)
        }

    def _run_step(
        self, workflow_name: str, step_name: str, frontier: DataFrame,
        trace: RequestTrace, persisted: list, depth: int = 0,
        n_invocations: int | None = None,
    ) -> DataFrame:
        """Run one step over a frontier of invocations; returns reduced
        rows (inv, parent_inv, seq, k, v) for those invocations.

        Intermediates are persisted (the reference durably writes every
        stage boundary to etcd — mr/job_engine.py:421-439; for us a
        persist is enough because Spark recomputes lineage on loss) and
        unpersisted by the caller after the final action — never
        collected to the driver.

        When the frontier is wide enough (``n_invocations`` ≥ the fuse
        threshold), the phase-1 pass FUSES each invocation's fan-out
        subtree in-task (guide §1.2-1/§2.4): child invocations are
        single-pair by construction, so their map→combine→reduce and
        this step's fold need no exchange; the driver recursion below
        then only handles invocations that fell back (unknown step,
        depth cap, or a fan-out wider than FUSE_MAX_CHILDREN)."""
        if depth > _MAX_DEPTH:
            raise RuntimeError(f"fan-out depth exceeded {_MAX_DEPTH}")
        step = self.catalog.get_step(workflow_name, step_name)
        plan = self._step_plan(step)
        trace.record(depth, step_name, "map")

        # The frontier is read by several consumers (the phase-1 map,
        # the forensic capture's distinct + sample aggregations, and on
        # the fan-out path the parent_map distinct) — persist it once
        # so the source scan/JSON encode doesn't re-run per consumer
        # (guide §5: reuse beats recompute when the recompute is a
        # corpus pass; unpersisted by the caller like map_out).
        frontier = frontier.persist()
        persisted.append(frontier)

        # Group by a HASH BUCKET of the invocation id, not the id: a
        # wide fan-out makes invocations per-pair (reference semantics),
        # and per-id grouping would pay pandas-group overhead per PAIR.
        # Bucket count ~4 groups per core keeps every task busy while
        # the in-UDF loop amortizes Arrow batching over invocations.
        n_buckets = max(self.spark.sparkContext.defaultParallelism * 4, 64)
        # Decide forensics at plan-build time (single-writer trace: the
        # cap can only have been consumed by steps that already ran):
        # when capture will run, phase 1 emits the per-invocation
        # forensic rows itself — see _make_phase1_udf.
        want_forensics = (
            self.capture_forensics
            and trace is not None
            and len(trace.invocations) < INVOCATION_CAP
        )
        plans = self._fuse_plans(workflow_name, n_invocations)
        map_out = frontier.groupBy(
            F.pmod(F.xxhash64("inv"), F.lit(n_buckets)).alias("_bucket")
        ).applyInPandas(
            _make_phase1_udf(
                plan, self.workdir, want_forensics, plans, depth,
                fuse_max=FUSE_MAX_CHILDREN,
            ),
            schema=_ROWS_SCHEMA,
        ).persist()
        persisted.append(map_out)
        self._capture_invocations(map_out, trace, depth, step_name)
        reduced = map_out.filter(F.col("row_type") == "reduced")
        child_rows = map_out.filter(F.col("row_type") == "child")
        # Routing + fused-trace discovery in ONE tiny collect (bounded
        # by catalog steps × depth, not data): distinct next steps of
        # fallback child rows (with per-step invocation counts feeding
        # the next level's fuse decision) plus the 'traceev' fan-out
        # transitions fused subtrees took.
        route_rows = (
            map_out.filter(F.col("row_type").isin("child", "traceev"))
            .select(
                "row_type",
                # parent_inv is per-parent on child rows — mask it so
                # the aggregate stays bounded by catalog steps, not data
                F.when(
                    F.col("row_type") == "traceev", F.col("parent_inv")
                ).alias("pstep"),
                "step",
                "seq",
            )
            .groupBy("row_type", "pstep", "step", "seq")
            .count()
            .collect()
        )
        next_steps: dict[str, int] = {}
        for r in route_rows:
            if r["row_type"] == "child":
                next_steps[r["step"]] = next_steps.get(r["step"], 0) + r["count"]
        transitions = sorted(
            (r["pstep"], r["step"], r["seq"])
            for r in route_rows
            if r["row_type"] == "traceev"
        )

        # Fused-subtree trace events + per-node captures, replayed in
        # the exact pre-order the driver recursion used to produce:
        # map → [per child step: fanout-edge, child subtree] → fold.
        # The root's own "map" event and invocation capture happened
        # above; descendants' come from the traceev/forensic rows.
        def _visit(d: int, s: str, capture_sessions: bool = True) -> None:
            kids = sorted(
                {cs for (ps, cs, cd) in transitions if ps == s and cd == d + 1}
            )
            if kids and capture_sessions:
                self._capture_sessions(map_out, trace, d, s)
            for ns in kids:
                trace.record(d, s, f"fanout→{ns}")
                trace.record(d + 1, ns, "map")
                self._capture_invocations(map_out, trace, d + 1, ns)
                _visit(d + 1, ns)
            if kids:
                trace.record(d, s, "fold")

        if transitions and not next_steps:
            _visit(depth, step_name)
        if not next_steps:
            return reduced
        if transitions:
            # mixed case (some invocations fused, some fell back):
            # replay the fused events first, then run the fallback
            # recursion below — step_sequence/edges dedup the overlap.
            # Root session rows (fused + fallback parents share the
            # root (step, depth) node) are captured once, below.
            _visit(depth, step_name, capture_sessions=False)

        # fan-out fallback: recurse per next step, then fold children
        # into their parents with this step's reducer.
        sessions = map_out.filter(F.col("row_type") == "session")
        self._capture_sessions(map_out, trace, depth, step_name)
        child_results = []
        for ns in sorted(next_steps):
            trace.record(depth, step_name, f"fanout→{ns}")
            child_frontier = child_rows.filter(F.col("step") == ns).select(
                "row_type", "inv", "parent_inv", "step", "seq", "k", "v"
            )
            child_results.append(
                self._run_step(
                    workflow_name, ns, child_frontier, trace, persisted,
                    depth + 1, n_invocations=next_steps[ns],
                )
            )
        all_children = child_results[0]
        for df in child_results[1:]:
            all_children = all_children.unionByName(df)

        trace.record(depth, step_name, "fold")
        # child results keyed by their parent (= this level's inv).
        # Sessions are restricted to invocations that actually have
        # fold input: a fused invocation's fold already ran in-task,
        # and its session rows must not spawn an empty-input fold group
        # in the cogroup below.
        fold_in = all_children.withColumn("gkey", F.col("parent_inv"))
        fallback_parents = child_rows.select(
            F.col("parent_inv").alias("inv")
        ).distinct()
        sess_in = sessions.join(fallback_parents, "inv", "left_semi").withColumn(
            "gkey", F.col("inv")
        )
        folded = (
            fold_in.groupBy("gkey")
            .cogroup(sess_in.groupBy("gkey"))
            .applyInPandas(_make_fold_udf(plan), schema=_ROWS_SCHEMA)
        )
        # stamp each folded invocation's own parent for the next level up
        parent_map = frontier.select(
            F.col("inv").alias("inv"), F.col("parent_inv").alias("pinv")
        ).distinct()
        folded = (
            folded.drop("parent_inv")
            .join(parent_map, "inv", "left")
            .withColumnRenamed("pinv", "parent_inv")
            .select("row_type", "inv", "parent_inv", "step", "seq", "k", "v")
        )
        return reduced.unionByName(folded)

    def submit(
        self,
        workflow_name: str,
        job_name: str,
        arguments: dict,
        blocking: bool = True,
        context: dict | None = None,
        result_writer: str = "inline",
        writer_options: dict | None = None,
    ) -> Request:
        """Run a job. Blocking returns the finished Request with
        ``.result``; async returns immediately with a request id and
        fires the result writer on completion (reference:
        mr/views/job.py:50, mr/job_engine.py:983-1019)."""
        self.catalog.get_workflow(workflow_name)
        job = self.catalog.get_job(workflow_name, job_name)
        step = self.catalog.get_step(workflow_name, job.initial_step_name)
        mapper = self.catalog.get_handler(workflow_name, step.map_handler_name)
        cast_args = mapper.cast_arguments(arguments)

        request = Request(
            request_id=uuid.uuid4().hex,
            workflow_name=workflow_name,
            job_name=job_name,
            context=context,
            is_blocking=blocking,
            trace=RequestTrace(),
        )
        with self._requests_lock:
            self._requests[request.request_id] = request

        def run():
            persisted: list[DataFrame] = []
            try:
                # content-derived root id: identical submissions replay the
                # same invocation tree (and the same per-invocation RNG
                # seeds), making results golden-hashable (FIXTURES.md A.4).
                root_inv = hashlib.sha1(
                    f"{workflow_name}:{job_name}:{_encode(dict(cast_args))}".encode()
                ).hexdigest()
                rows = [
                    ("arg", root_inv, None, job.initial_step_name, i, _encode(k), _encode(v))
                    for i, (k, v) in enumerate(cast_args)
                ] or [("arg_empty", root_inv, None, job.initial_step_name, 0, None, None)]
                frontier = self.spark.createDataFrame(rows, schema=_ROWS_SCHEMA)
                result_rows = self._run_step(
                    workflow_name, job.initial_step_name, frontier,
                    request.trace, persisted,
                    # submit() runs ONE root invocation — never fused,
                    # so a wide root fan-out distributes its children.
                    n_invocations=1,
                )
                pairs = [
                    (_decode(r["k"]), _decode(r["v"]))
                    for r in sorted(result_rows.collect(), key=lambda r: r["seq"])
                ]
                writer = result_writers.get_writer(result_writer, writer_options)
                request.result = writer.render(request, pairs)
            except Exception as e:  # error stamping parity
                msg = str(e)
                request.error = msg
                if "JOBX_HANDLER_ERROR" in msg:
                    marker = msg[msg.index("JOBX_HANDLER_ERROR"):]
                    request.failed_invocation_id = _extract_field(marker, "inv")
                if blocking:
                    request.is_done = True
                    request.finished_at = time.time()
                    raise
            finally:
                # request cleanup (GC parity — mr/request_cleanup.py):
                # intermediates die with the request, not the session.
                for df in persisted:
                    df.unpersist()
                request.is_done = True
                request.finished_at = time.time()

        if blocking:
            run()
            return request
        thread = threading.Thread(target=run, name=f"jobx-{request.request_id}", daemon=True)
        thread.start()
        return request

    def get_request(self, request_id: str) -> Request:
        with self._requests_lock:
            return self._requests[request_id]

    def cleanup_request(self, workflow_name: str, request_id: str) -> Request:
        """Drop a FINISHED request — trace, sessions, registry entry —
        from this engine (reference: mr_kv_request_cleanup walks and
        deletes the request's KV subtree, setup.py:52; our plane is the
        driver registry, so cleanup is a registry pop plus unpersisting
        any dataset-sink result still cached).

        Raises KeyError for unknown/foreign requests and ValueError for
        a request still running — the reference's cleanup likewise only
        makes sense for settled requests (a running one would rebuild
        its subtree mid-walk)."""
        with self._requests_lock:
            request = self._requests[request_id]
            if request.workflow_name != workflow_name:
                raise KeyError(request_id)
            if not request.is_done and request.error is None:
                raise ValueError(f"request {request_id} is still running")
            del self._requests[request_id]
        if request.result_df is not None:
            try:
                request.result_df.unpersist()
            except Exception:  # noqa: BLE001 - cleanup best-effort
                pass
        return request

    def list_requests(self, workflow_name: str | None = None) -> list[Request]:
        """Known requests, newest-first (reference: the request KV range
        walk its cleanup/read scripts iterate; driver registry here)."""
        with self._requests_lock:
            snapshot = tuple(self._requests.values())
        reqs = [
            r for r in snapshot
            if workflow_name is None or r.workflow_name == workflow_name
        ]
        return sorted(reqs, key=lambda r: r.created_at, reverse=True)

    def find_invocation(
        self, workflow_name: str, invocation_id: str
    ) -> tuple[Request, "InvocationRecord"]:
        """Locate one invocation record across the workflow's requests
        (reference: mr_kv_invocation_get reads the invocation entity by
        id — ids are unique across requests there and here).

        Raises KeyError when no request of the workflow traced it, and
        ValueError when a short prefix matches more than one invocation
        — like git, an ambiguous abbreviation is an error, never a
        silent first-match resolution (ADVICE r4)."""
        matches: list[tuple[Request, "InvocationRecord"]] = []
        for req in self.list_requests(workflow_name):
            if req.trace is None:
                continue
            for rec in req.trace.invocations:
                if rec.inv == invocation_id:
                    return req, rec  # exact id: unique by construction
                if rec.inv.startswith(invocation_id):
                    matches.append((req, rec))
        if len(matches) > 1:
            ids = sorted(rec.inv for _, rec in matches)
            raise ValueError(
                f"ambiguous invocation prefix {invocation_id!r}: matches "
                f"{ids[:5]}{'...' if len(ids) > 5 else ''}"
            )
        if matches:
            return matches[0]
        raise KeyError(invocation_id)

    def submit_dataset(
        self,
        workflow_name: str,
        job_name: str,
        pairs_df: DataFrame,
        n_buckets: int = 64,
        result_writer: str = "inline",
        writer_options: dict | None = None,
    ) -> Request:
        """Run a job over a table-scale pair dataset.

        The reference's only source is the small HTTP arguments dict;
        parallelism comes from fan-out. For table input we pre-fan-out:
        rows are hashed into ``n_buckets`` child invocations (map +
        partial reduce run bucket-parallel), then folded into the root
        with the same step's reducer — the reference's fan-out/fold-up
        semantics (mr/job_engine.py:689-819) aligned with Spark's
        partial/final aggregation. ``pairs_df`` must have columns
        ``k``/``v`` as JSON-encoded strings.

        Result contract: for dataset sinks, ``request.result_df``
        carries DECODED ``k``/``v`` string columns (JSON-string quoting
        stripped; numbers as their text; arrays/objects as JSON text) —
        mirroring the inline path's ``_decode``, so string keys read
        back as ``foo``, not ``"foo"``. The files on disk keep the
        JSON-encoded pairs for lossless round-trips.

        At 100 TB: buckets are groups, not tasks — size n_buckets ~
        2-3x total cores; each bucket's pairs stream through one Arrow
        batch pipeline.
        """
        self.catalog.get_workflow(workflow_name)
        job = self.catalog.get_job(workflow_name, job_name)
        step = self.catalog.get_step(workflow_name, job.initial_step_name)
        plan = self._step_plan(step)

        request = Request(
            request_id=uuid.uuid4().hex,
            workflow_name=workflow_name,
            job_name=job_name,
            context=None,
            is_blocking=True,
            trace=RequestTrace(),
        )
        with self._requests_lock:
            self._requests[request.request_id] = request
        persisted: list[DataFrame] = []
        try:
            root_inv = hashlib.sha1(f"{workflow_name}:{job_name}:dataset".encode()).hexdigest()
            # Bucket by (k, v), not k alone (guide §2.5: a synthetic
            # partitioning key with too few distinct values starves the
            # cluster): a dataset with a handful of distinct keys —
            # event_type has 5 — used to collapse into that many fat
            # invocations, capping phase-1 parallelism at 5 tasks no
            # matter the cluster and defeating subtree fusion's width
            # cap. Per-bucket partial reduce + the root fold's
            # cross-bucket merge is already this API's documented
            # contract ("partial/final aggregation"), so reducers must
            # merge across buckets either way; the results are
            # bucketing-invariant (all 4 mr_engine rows re-verified
            # hash-exact, test_dataset_sum_matches_python_fold green).
            bucket = F.pmod(F.xxhash64(F.col("k"), F.col("v")), F.lit(n_buckets))
            frontier = pairs_df.select(
                F.lit("arg").alias("row_type"),
                F.concat(F.lit(root_inv + ":"), bucket.cast("string")).alias("inv"),
                F.lit(root_inv).alias("parent_inv"),
                F.lit(job.initial_step_name).alias("step"),
                # seq orders arguments within an invocation; content-hash
                # keeps it deterministic without a global sort.
                F.xxhash64(F.col("k"), F.col("v")).alias("seq"),
                F.col("k"),
                F.col("v"),
            )
            leaf = self._run_step(
                workflow_name, job.initial_step_name, frontier,
                request.trace, persisted,
                # the pre-fan-out gives exactly n_buckets invocations
                # (sized 2-3× total cores by the contract above), so
                # fusion keeps parent-level parallelism intact.
                n_invocations=n_buckets,
            )
            request.trace.record(0, job.initial_step_name, "fold")
            fold_in = leaf.withColumn("gkey", F.col("parent_inv"))
            empty_sessions = self.spark.createDataFrame([], schema=_ROWS_SCHEMA)
            sess_in = empty_sessions.withColumn("gkey", F.col("inv"))
            folded = (
                fold_in.groupBy("gkey")
                .cogroup(sess_in.groupBy("gkey"))
                .applyInPandas(_make_fold_udf(plan), schema=_ROWS_SCHEMA)
            )
            if result_writer in _DATASET_SINKS:
                # distributed result path: the folded output is written
                # by the executors (sources/sinks.py), never collected —
                # at table scale (per-user/per-key results over 100 TB of
                # input) the driver only sees a path. seq rides along so
                # a reader can restore the reducer's deterministic order.
                opts = dict(writer_options or {})
                path = opts.pop("path")
                out = folded.select("seq", "k", "v")
                _DATASET_SINKS[result_writer](out, path, **opts)
                # Decode on read-back (JVM-side): get_json_object('$')
                # unquotes JSON strings and passes other scalars/
                # composites through as text — the inline _decode
                # contract, so k.cast(...) and string keys both behave.
                request.result_df = _DATASET_READERS[result_writer](
                    self.spark, path
                ).select(
                    "seq",
                    F.get_json_object("k", "$").alias("k"),
                    F.get_json_object("v", "$").alias("v"),
                )
                request.result = {
                    "path": path,
                    "format": result_writer,
                    "n_pairs": request.result_df.count(),
                }
            else:
                pairs = [
                    (_decode(r["k"]), _decode(r["v"]))
                    for r in sorted(folded.collect(), key=lambda r: r["seq"])
                ]
                writer = result_writers.get_writer(result_writer, writer_options)
                request.result = writer.render(request, pairs)
            return request
        finally:
            for df in persisted:
                df.unpersist()
            request.is_done = True
            request.finished_at = time.time()


def _extract_field(marker: str, name: str) -> str | None:
    for tok in marker.split():
        if tok.startswith(f"{name}="):
            return tok.split("=", 1)[1]
    return None


_BY_VALUE_MODULES: set[str] = set()


def _ensure_fn_ships(fn) -> None:
    """Handler callables live in arbitrary user modules that executors
    can't import (the reference ships handler *source* through etcd for
    the same reason — mr/models/kv/handler.py). Registering the defining
    module for cloudpickle by-value serialization makes the closure
    self-contained on the wire."""
    mod_name = getattr(fn, "__module__", None)
    if not mod_name or mod_name in ("__main__", "builtins"):
        return  # __main__ already pickles by value
    if mod_name.startswith(("jobx_spark", "pyspark", "pandas", "numpy")):
        return
    if mod_name in _BY_VALUE_MODULES:
        return
    import sys

    from pyspark import cloudpickle  # the vendored instance Spark serializes with

    mod = sys.modules.get(mod_name)
    if mod is not None:
        try:
            cloudpickle.register_pickle_by_value(mod)
            _BY_VALUE_MODULES.add(mod_name)
        except Exception:
            pass  # fall back to by-reference (module importable on workers)
