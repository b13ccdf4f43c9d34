"""Hot-reload daemon: edit a handler source file → next submit uses the
new version, with no explicit re-register (reference:
mr/handlers/general.py:136-234 update-check loop)."""

import time

import pytest

from jobx_spark.engine import Engine
from jobx_spark.hot_reload import HandlerUpdateLoop

MAPPER_V1 = '''
"""double each argument.
**
{"handler_type": "mapper", "argument_spec": [["arg1", "int"]]}
"""
yield MrConfigureToReturn()
for k, v in arguments:
    yield (k, v * 2)
'''

MAPPER_V2 = MAPPER_V1.replace("v * 2", "v * 3")

REDUCER = '''
"""sum values per key.
**
{"handler_type": "reducer", "argument_spec": []}
"""
for k, vl in results:
    yield (k, sum(vl))
'''


@pytest.fixture()
def workbench(spark, tmp_path):
    src = tmp_path / "handlers"
    src.mkdir()
    (src / "dbl.py").write_text(MAPPER_V1)
    (src / "tot.py").write_text(REDUCER)

    eng = Engine(spark)
    eng.create_workflow("wfr")
    loop = HandlerUpdateLoop(eng.catalog, "wfr", str(src), interval_s=0.2)
    loop.start()
    eng.create_step("wfr", "s1", "dbl", "tot")
    eng.create_job("wfr", "j1", "s1")
    yield eng, loop, src
    loop.stop()


def test_initial_sync_registers_handlers(workbench):
    eng, loop, _src = workbench
    assert sorted(h.name for h in eng.catalog.list_handlers("wfr")) == ["dbl", "tot"]
    req = eng.submit("wfr", "j1", {"arg1": 21})
    assert req.result["pairs"] == [["arg1", 42]]


def test_edit_is_picked_up_without_reregister(workbench):
    eng, loop, src = workbench
    assert eng.submit("wfr", "j1", {"arg1": 10}).result["pairs"] == [["arg1", 20]]
    v1 = eng.catalog.get_handler("wfr", "dbl").version

    (src / "dbl.py").write_text(MAPPER_V2)
    deadline = time.time() + 10
    while time.time() < deadline:
        if eng.catalog.get_handler("wfr", "dbl").version != v1:
            break
        time.sleep(0.05)
    assert eng.catalog.get_handler("wfr", "dbl").version != v1

    # next submit compiles the NEW source — same job, no re-register call
    assert eng.submit("wfr", "j1", {"arg1": 10}).result["pairs"] == [["arg1", 30]]


def test_unchanged_tree_is_skipped(workbench):
    _eng, loop, _src = workbench
    res = loop.check_once()
    assert res.get("skipped") is True


def test_deleted_source_is_garbage_collected(workbench):
    eng, loop, src = workbench
    (src / "extra.py").write_text(REDUCER)
    loop.check_once()
    assert any(h.name == "extra" for h in eng.catalog.list_handlers("wfr"))
    (src / "extra.py").unlink()
    loop.check_once()
    assert not any(h.name == "extra" for h in eng.catalog.list_handlers("wfr"))


def test_failed_pass_is_observable(workbench):
    """A broken tree must not look 'quietly in sync' (ADVICE r2): the
    daemon loop records failures on last_error and clears it on the
    next good pass."""
    eng, loop, src = workbench
    good = (src / "dbl.py").read_text()
    (src / "dbl.py").write_text('"""broken\n**\nnot-json\n"""\nyield 1\n')
    loop.interval_s = 0.05
    loop._known_state = None  # force a re-scan of the broken tree
    loop._thread = None
    import threading

    t = threading.Thread(target=loop._run, daemon=True)
    t.start()
    deadline = time.time() + 5
    while time.time() < deadline and loop.last_error is None:
        time.sleep(0.02)
    assert loop.last_error is not None and "not-json" not in (loop.last_result or {})

    (src / "dbl.py").write_text(good)
    deadline = time.time() + 5
    while time.time() < deadline and loop.last_error is not None:
        time.sleep(0.02)
    loop._exit.set()
    t.join(timeout=5)
    assert loop.last_error is None
