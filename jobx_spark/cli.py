"""Entity CRUD + submission CLI — parity with the reference's 30
``mr_kv_*`` scripts (reference: setup.py:37-71; e.g.
mr/resources/scripts/mr_kv_step_create:17-68) collapsed into one
argparse tool over a JSON catalog file:

    python -m jobx_spark.cli --catalog cat.json workflow-create wf "desc"
    python -m jobx_spark.cli --catalog cat.json handler-sync wf handlers/
    python -m jobx_spark.cli --catalog cat.json step-create wf s1 map_h reduce_h
    python -m jobx_spark.cli --catalog cat.json job-create wf j1 s1
    python -m jobx_spark.cli --catalog cat.json submit wf j1 '{"arg1": 10}'
    python -m jobx_spark.cli --catalog cat.json entity-list wf

Everything except ``submit`` is pure metadata (no SparkSession).
``handler-sync`` is the reference's filesystem sync (mr/handlers/
sync.py:18-307): walk a source tree, parse docstring metadata, SHA1-
version, create/update; handlers removed from the tree are deleted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from jobx_spark.catalog import Catalog, Handler


def _load(path: str) -> Catalog:
    return Catalog.load(path) if os.path.exists(path) else Catalog()


def sync_handlers_from_dir(catalog: Catalog, workflow_name: str, root: str) -> dict:
    """Walk ``root`` for ``*.py`` handler sources (docstring-metadata
    format), registering each under its stem name. Returns
    {created: [...], updated: [...], deleted: [...]} — the same
    create/update/garbage-collect contract as the reference's
    HandlerSync.run()."""
    from jobx_spark.catalog import CatalogError
    from jobx_spark.handlers import parse_docstring_metadata

    seen, created, updated = set(), [], []
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            name = fname[:-3]
            with open(os.path.join(dirpath, fname), encoding="utf-8") as f:
                source = f.read()
            meta = parse_docstring_metadata(source)
            h = Handler(
                workflow_name=workflow_name,
                name=name,
                handler_type=meta["handler_type"],
                source_code=source,
                argument_spec=meta["argument_spec"],
                required_capability=meta.get("required_capability"),
            )
            seen.add(name)
            try:
                old = catalog.get_handler(workflow_name, name)
                if old.version != h.version:
                    catalog.register_handler(h)
                    updated.append(name)
            except CatalogError:
                catalog.register_handler(h)
                created.append(name)
    deleted = []
    for h in list(catalog.list_handlers(workflow_name)):
        if h.name not in seen and h.source_code is not None:
            catalog.delete_handler(workflow_name, h.name)
            deleted.append(h.name)
    return {"created": created, "updated": updated, "deleted": sorted(deleted)}


def serve(
    catalog: Catalog,
    host: str = "127.0.0.1",
    port: int = 0,
    cpus: str = "8",
    insecure_bind: bool = False,
):
    """Start the HTTP façade over an engine built from ``catalog``;
    returns the running :class:`jobx_spark.http_api.JobxHttpServer`
    (non-blocking — callers own its lifetime).

    Trust model: the API has NO authentication and the engine compiles
    and executes handler source from the catalog — exposing the port on
    a non-loopback interface hands remote code execution to anyone who
    can reach it. Binding anywhere but 127.0.0.1/localhost therefore
    requires the explicit ``insecure_bind`` opt-in (``--insecure-bind``
    on the CLI); put a real authenticating proxy in front for anything
    beyond a trusted host."""
    from jobx_spark.engine import Engine
    from jobx_spark.http_api import JobxHttpServer
    from jobx_spark.session import get_spark

    if host not in ("127.0.0.1", "localhost", "::1") and not insecure_bind:
        raise SystemExit(
            f"refusing to bind {host!r}: the API is unauthenticated and "
            "executes catalog handler source (remote code execution). "
            "Pass --insecure-bind to bind a non-loopback interface anyway."
        )
    spark = get_spark("jobx_serve", cpus=cpus)
    eng = Engine(spark, catalog=catalog)
    return JobxHttpServer(eng, host=host, port=port).start()


def _http_json(url: str) -> dict:
    from urllib.request import urlopen

    with urlopen(url) as resp:  # noqa: S310 - user-supplied --server target
        return json.loads(resp.read().decode())


def _read_side(args) -> dict:
    """request-get / invocation-get / graph-draw / request-list against
    a running ``serve`` — the CLI face of the HTTP read routes
    (reference scripts: mr_kv_request_get, mr_kv_invocation_get,
    mr_draw_invocation_graph; setup.py:37-71)."""
    base = args.server.rstrip("/")
    wf = args.workflow
    if args.cmd == "request-list":
        return _http_json(f"{base}/requests/{wf}")
    if args.cmd == "request-cleanup":
        # reference: mr_kv_request_cleanup (setup.py:52) — drop one
        # finished request's trace/sessions/registry entry from the
        # running serve.
        from urllib.request import Request, urlopen

        req = Request(  # noqa: S310 - user-supplied --server target
            f"{base}/request/{wf}/{args.request_id}", method="DELETE"
        )
        with urlopen(req) as resp:  # noqa: S310
            return json.loads(resp.read().decode())
    if args.cmd == "request-get":
        out = _http_json(f"{base}/result/{wf}/{args.request_id}")
        flat = _http_json(f"{base}/request/{wf}/{args.request_id}?format=flat")
        out["invocations"] = flat.get("invocations", [])
        return out
    if args.cmd == "invocation-get":
        return _http_json(f"{base}/invocation/{wf}/{args.invocation_id}")
    if args.cmd == "tree-get":
        # reference: mr_kv_t_mapped_steps_get (setup.py:59) — read the
        # RelationshipsTree (RT_MAPPED/RT_REDUCED edges) under one
        # invocation (mr/models/kv/trees/relationships.py:5-41). Our
        # lineage plane is the driver trace, so the read-side verb
        # reconstructs the same edge sets from it; the _create/_add
        # mutation scripts are N/A-by-design (SURVEY §8.1) — there is
        # no external KV tree to hand-edit, the engine owns lineage.
        inv = _http_json(f"{base}/invocation/{wf}/{args.invocation_id}")
        flat = _http_json(
            f"{base}/request/{wf}/{inv['request_id']}?format=flat"
        )
        me = inv["invocation"]
        children = [
            r for r in flat.get("invocations", []) if r.get("parent") == me
        ]
        return {
            "invocation": me,
            "request_id": inv["request_id"],
            "mapped": [r["invocation"] for r in children],
            "mapped_steps": sorted({r["step"] for r in children}),
            "n_mapped": inv.get("n_mapped"),
            "n_reduced": inv.get("n_reduced"),
        }
    # graph-draw: fetch DOT source, write request-<id>.dot (the
    # reference's _OUTPUT_FILEPATH_TEMPLATE), optionally render PNG.
    from urllib.request import urlopen

    with urlopen(f"{base}/request/{wf}/{args.request_id}") as resp:  # noqa: S310
        dot_source = resp.read().decode()
    path = args.output or f"request-{args.request_id}.dot"
    with open(path, "w", encoding="utf-8") as f:
        f.write(dot_source)
    out = {"dot_file": path}
    if args.render:
        import shutil
        import subprocess

        dot_bin = shutil.which("dot")
        if dot_bin:
            png = path.rsplit(".", 1)[0] + ".png"
            subprocess.run([dot_bin, "-Tpng", path, "-o", png], check=True)
            out["png_file"] = png
        else:
            out["render_skipped"] = "graphviz `dot` not installed"
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="jobx_spark.cli")
    ap.add_argument("--catalog", required=True, help="JSON catalog file")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("workflow-create")
    p.add_argument("workflow"); p.add_argument("description", nargs="?", default="")

    p = sub.add_parser("handler-sync")
    p.add_argument("workflow"); p.add_argument("source_dir")

    p = sub.add_parser("step-create")
    p.add_argument("workflow"); p.add_argument("name")
    p.add_argument("map_handler"); p.add_argument("reduce_handler")
    p.add_argument("--combine-handler", default=None)

    p = sub.add_parser("job-create")
    p.add_argument("workflow"); p.add_argument("name"); p.add_argument("initial_step")

    p = sub.add_parser("submit")
    p.add_argument("workflow"); p.add_argument("job"); p.add_argument("arguments")
    p.add_argument("--cpus", default="8")

    sub.add_parser("entity-list").add_argument("workflow")

    # per-entity get/delete/list — the reference's mr_kv_{workflow,
    # handler,step,job}_{get,delete,list} scripts (mr/resources/
    # scripts/, setup.py:37-71), one subcommand each.
    sub.add_parser("workflow-get").add_argument("workflow")
    sub.add_parser("workflow-delete").add_argument("workflow")
    sub.add_parser("workflow-list")
    for ent in ("handler", "step", "job"):
        p = sub.add_parser(f"{ent}-get")
        p.add_argument("workflow"); p.add_argument("name")
        p = sub.add_parser(f"{ent}-delete")
        p.add_argument("workflow"); p.add_argument("name")
        sub.add_parser(f"{ent}-list").add_argument("workflow")

    # mr_kv_step_set_handler: swap one handler on an existing step
    p = sub.add_parser("step-set-handler")
    p.add_argument("workflow"); p.add_argument("name")
    p.add_argument("slot", choices=["map", "reduce", "combine"])
    p.add_argument("handler")

    # mr_kv_step_update_handlers: bulk re-point — every step whose
    # <slot> handler is if_name gets to_name (reference script walks
    # all steps of the workflow; -s scans without changing).
    p = sub.add_parser("step-update-handlers")
    p.add_argument("workflow")
    p.add_argument("slot", choices=["map", "reduce", "combine"])
    p.add_argument("if_name"); p.add_argument("to_name")
    p.add_argument("-s", "--simulate-only", action="store_true")

    # read-side over a RUNNING serve process (the reference reads the
    # shared etcd plane; our shared plane is the serving engine):
    # mr_kv_request_get / mr_kv_invocation_get / mr_draw_invocation_graph
    # / the request-range walk.
    for name, extra in (
        ("request-get", "request_id"),
        ("invocation-get", "invocation_id"),
        ("tree-get", "invocation_id"),
        ("graph-draw", "request_id"),
        ("request-list", None),
        ("request-cleanup", "request_id"),
    ):
        p = sub.add_parser(name)
        p.add_argument("workflow")
        if extra:
            p.add_argument(extra)
        p.add_argument("--server", required=True,
                       help="base URL of a running `serve` (http://host:port)")
        if name == "graph-draw":
            p.add_argument("-o", "--output", default=None,
                           help="DOT output path (default request-<id>.dot)")
            p.add_argument("--render", action="store_true",
                           help="also render PNG via graphviz `dot` if installed")

    p = sub.add_parser("notify-listen")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=3333)

    p = sub.add_parser("serve")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--cpus", default="8")
    p.add_argument(
        "--insecure-bind", action="store_true",
        help="allow binding a non-loopback host (unauthenticated RCE "
        "surface — see cli.serve docstring)",
    )

    args = ap.parse_args(argv)

    if args.cmd == "notify-listen":
        # reference parity: mr_http_notification_listen — a NOTIFY/HTTP
        # log-hook sink printing one line per delivered record (point
        # JOBX_LOG_HTTP_HOSTNAME/PORT here). Catalog-independent.
        from jobx_spark.http_api import NotificationListener

        listener = NotificationListener(host=args.host, port=args.port).start()
        print(json.dumps({"listening": f"{args.host}:{listener.port}"}),
              flush=True)
        try:
            while True:
                import time

                time.sleep(3600)
        except KeyboardInterrupt:
            listener.stop()
        return 0

    cat = _load(args.catalog)
    out: dict

    if args.cmd == "workflow-create":
        cat.create_workflow(args.workflow, args.description)
        out = {"workflow": args.workflow}
    elif args.cmd == "handler-sync":
        out = sync_handlers_from_dir(cat, args.workflow, args.source_dir)
    elif args.cmd == "step-create":
        cat.create_step(args.workflow, args.name, args.map_handler,
                        args.reduce_handler, args.combine_handler)
        out = {"step": args.name}
    elif args.cmd == "job-create":
        cat.create_job(args.workflow, args.name, args.initial_step)
        out = {"job": args.name}
    elif args.cmd == "entity-list":
        out = {
            "handlers": [h.name for h in cat.list_handlers(args.workflow)],
            "steps": [s.name for s in cat.list_steps(args.workflow)],
            "jobs": [j.name for j in cat.list_jobs(args.workflow)],
        }
    elif args.cmd == "workflow-get":
        out = vars(cat.get_workflow(args.workflow))
    elif args.cmd == "workflow-delete":
        cat.delete_workflow(args.workflow)
        out = {"deleted": args.workflow}
    elif args.cmd == "workflow-list":
        out = {"workflows": [w.name for w in cat.list_workflows()]}
    elif args.cmd == "handler-get":
        out = {
            k: v for k, v in vars(cat.get_handler(args.workflow, args.name)).items()
            if k != "fn"
        }
    elif args.cmd == "handler-delete":
        cat.delete_handler(args.workflow, args.name)
        out = {"deleted": args.name}
    elif args.cmd == "handler-list":
        out = {"handlers": [h.name for h in cat.list_handlers(args.workflow)]}
    elif args.cmd == "step-get":
        out = vars(cat.get_step(args.workflow, args.name))
    elif args.cmd == "step-delete":
        cat.delete_step(args.workflow, args.name)
        out = {"deleted": args.name}
    elif args.cmd == "step-list":
        out = {"steps": [s.name for s in cat.list_steps(args.workflow)]}
    elif args.cmd == "job-get":
        out = vars(cat.get_job(args.workflow, args.name))
    elif args.cmd == "job-delete":
        cat.delete_job(args.workflow, args.name)
        out = {"deleted": args.name}
    elif args.cmd == "job-list":
        out = {"jobs": [j.name for j in cat.list_jobs(args.workflow)]}
    elif args.cmd == "step-set-handler":
        from jobx_spark.catalog import HT_COMBINER, HT_MAPPER, HT_REDUCER, CatalogError

        step = cat.get_step(args.workflow, args.name)
        h = cat.get_handler(args.workflow, args.handler)
        want = {"map": HT_MAPPER, "reduce": HT_REDUCER, "combine": HT_COMBINER}[args.slot]
        if h.handler_type != want:
            raise CatalogError(f"{args.handler!r} is not a {args.slot} handler")
        setattr(step, f"{args.slot}_handler_name", args.handler)
        out = {"step": step.name, "slot": args.slot, "handler": args.handler}
    elif args.cmd == "step-update-handlers":
        from jobx_spark.catalog import HT_COMBINER, HT_MAPPER, HT_REDUCER, CatalogError

        want = {"map": HT_MAPPER, "reduce": HT_REDUCER, "combine": HT_COMBINER}[args.slot]
        to = cat.get_handler(args.workflow, args.to_name)
        if to.handler_type != want:
            raise CatalogError(
                f"'to' handler exists, but is the wrong type: {to.handler_type!r}"
            )
        slot_attr = f"{args.slot}_handler_name"
        matched = []
        for step in cat.list_steps(args.workflow):
            if getattr(step, slot_attr) == args.if_name:
                if not args.simulate_only:
                    setattr(step, slot_attr, args.to_name)
                matched.append(step.name)
        out = {
            "matched": sorted(matched),
            "slot": args.slot,
            "to": args.to_name,
            "simulate": bool(args.simulate_only),
        }
    elif args.cmd in (
        "request-get", "invocation-get", "tree-get", "graph-draw",
        "request-list", "request-cleanup",
    ):
        cat.get_workflow(args.workflow)  # same existence check the reference does
        out = _read_side(args)
    elif args.cmd == "serve":
        # the reference ships gunicorn launcher scripts (setup.py:37-71);
        # here one command serves the same HTTP contract over the catalog
        srv = serve(cat, host=args.host, port=args.port, cpus=args.cpus)
        print(json.dumps({"url": srv.url}), flush=True)
        try:
            while True:
                import time

                time.sleep(3600)
        except KeyboardInterrupt:
            srv.stop()
        return 0
    elif args.cmd == "submit":
        from jobx_spark.engine import Engine
        from jobx_spark.session import get_spark

        spark = get_spark("jobx_cli", cpus=args.cpus)
        eng = Engine(spark, catalog=cat)
        req = eng.submit(args.workflow, args.job, json.loads(args.arguments))
        out = req.result
    else:  # pragma: no cover
        raise AssertionError(args.cmd)

    if args.cmd not in (
        "submit", "request-get", "invocation-get", "tree-get", "graph-draw",
        "request-list", "request-cleanup",
    ):
        cat.save(args.catalog)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
