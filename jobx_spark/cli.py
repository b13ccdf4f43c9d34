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

    if args.cmd != "submit":
        cat.save(args.catalog)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
