"""Round-13 additions: the fused MR fan-out subtree (engine.py) must be
bit-equivalent to the distributed recursion it replaces — results,
trace events, invocation forensics and session capture all identical
(OPTIMIZATION_r13.md §"MR engine").
"""

from __future__ import annotations

import pytest

from jobx_spark.engine import FUSE_MAX_CHILDREN, Engine
from jobx_spark.handlers import MrConfigureToMap, MrConfigureToReturn


def mapper_split(scope, arguments):
    scope.session_set("key1", 123)
    scope.session_set("key2", "uvw")
    yield MrConfigureToMap("step_chunk")
    for _name, value in arguments:
        yield (0, value // 2)
        yield (1, value // 2 + value % 2)


def mapper_chunk(scope, arguments):
    import random

    yield MrConfigureToReturn()
    for _name, value in arguments:
        remaining = value
        while remaining > 0:
            part = random.randint(1, max(1, remaining // 2))
            remaining -= part
            yield (random.randint(0, 9), part)


def mapper_split_deep(scope, arguments):
    yield MrConfigureToMap("step_split_mid")
    for _name, value in arguments:
        yield (0, value // 2)
        yield (1, value // 2 + value % 2)


def reducer_sum(scope, results):
    for k, value_list in results:
        total = 0
        for v in value_list:
            total += v if not isinstance(v, list) else sum(v)
        yield (k, total)


def reducer_noop(scope, results):
    for k, value_list in results:
        yield (k, value_list)


def _build(spark) -> Engine:
    e = Engine(spark)
    e.create_workflow("wf13")
    e.register_handler("wf13", "chunk", fn=mapper_chunk, handler_type="mapper",
                       argument_spec=[("arg1", "int")])
    e.register_handler("wf13", "split", fn=mapper_split, handler_type="mapper",
                       argument_spec=[("arg1", "int")])
    e.register_handler("wf13", "split_deep", fn=mapper_split_deep,
                       handler_type="mapper", argument_spec=[("arg1", "int")])
    e.register_handler("wf13", "sum", fn=reducer_sum, handler_type="reducer")
    e.register_handler("wf13", "noop", fn=reducer_noop, handler_type="reducer")
    e.create_step("wf13", "step_chunk", "chunk", "sum")
    e.create_step("wf13", "step_split", "split", "noop")
    e.create_step("wf13", "step_split_mid", "split", "noop")
    e.create_step("wf13", "step_split_top", "split_deep", "noop")
    e.create_job("wf13", "job_fan", "step_split")
    e.create_job("wf13", "job_deep", "step_split_top")
    return e


def _snapshot(req):
    """Everything observable about a finished request."""
    trace = req.trace
    return {
        "pairs": req.result["pairs"],
        "events": [(ev.depth, ev.step_name, ev.phase) for ev in trace.events],
        "invocations": [
            (r.inv, r.parent_inv, r.step, r.depth, r.n_args, r.n_mapped,
             r.n_reduced, tuple(map(tuple, r.arg_sample)))
            for r in trace.invocations
        ],
        "inv_truncated": trace.invocations_truncated,
        "sessions": list(trace.sessions),
        "sess_truncated": trace.sessions_truncated,
    }


@pytest.mark.parametrize("job", ["job_fan", "job_deep"])
def test_fused_subtree_matches_distributed_recursion(spark, job):
    """fuse_min_invocations=1 forces the in-task subtree; a huge
    threshold forces the legacy distributed recursion. Every observable
    — result pairs, trace events, invocation records (ids, parents,
    depths, counts, samples), captured sessions — must be identical."""
    e_fused = _build(spark)
    e_fused.fuse_min_invocations = 1
    e_plain = _build(spark)
    e_plain.catalog = e_fused.catalog  # same workflow, separate engines
    e_plain.fuse_min_invocations = 10**9

    # NOTE: submit() pins the root level unfused (n_invocations=1), so
    # fusion engages at the first recursion level (the split children).
    fused = _snapshot(e_fused.submit("wf13", job, {"arg1": 144}))
    plain = _snapshot(e_plain.submit("wf13", job, {"arg1": 144}))
    assert fused == plain


def test_fuse_width_cap_falls_back(spark, monkeypatch):
    """An invocation fanning wider than FUSE_MAX_CHILDREN must take the
    distributed path (no serialized mega-task) and still produce the
    same result."""
    import jobx_spark.engine as E

    assert FUSE_MAX_CHILDREN > 0
    monkeypatch.setattr(E, "FUSE_MAX_CHILDREN", 1)  # every fan-out too wide
    e = _build(spark)
    e.fuse_min_invocations = 1
    capped = _snapshot(e.submit("wf13", "job_fan", {"arg1": 40}))

    monkeypatch.setattr(E, "FUSE_MAX_CHILDREN", 16384)
    e2 = _build(spark)
    e2.catalog = e.catalog
    e2.fuse_min_invocations = 1
    fused = _snapshot(e2.submit("wf13", "job_fan", {"arg1": 40}))
    assert capped["pairs"] == fused["pairs"]
    assert capped["invocations"] == fused["invocations"]
    assert capped["sessions"] == fused["sessions"]
