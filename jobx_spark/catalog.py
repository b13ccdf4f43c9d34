"""Catalog: workflows, jobs, steps, handlers.

The reference stores these six entity classes as etcd-backed
active-record models (reference: mr/models/kv/model.py:82,
mr/models/kv/{workflow,job,step,handler}.py). Spark needs no
distributed KV for metadata — the driver owns it — so the catalog is
plain in-memory dataclasses with the same validation rules, optionally
persisted to a JSON file.

Validation parity:
  * handler argument_spec is an ordered list of (name, builtin_type)
    pairs (reference: mr/models/kv/handler.py:36,49-69);
  * mappers must declare exactly {'arguments'}, combiners/reducers
    exactly {'results'} (reference: mr/models/kv/handler.py:18-20,55-69);
  * a step's map/combine/reduce handler names must be distinct
    (reference: mr/models/kv/step.py:20-28);
  * handlers are content-versioned by SHA1 of their source
    (reference: mr/handlers/sync.py sha1 versioning).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import time
from dataclasses import dataclass, field

HT_MAPPER = "mapper"
HT_COMBINER = "combiner"
HT_REDUCER = "reducer"
HANDLER_TYPES = (HT_MAPPER, HT_COMBINER, HT_REDUCER)

# builtin-name → cast, mirroring the reference's getattr(__builtin__, name)
# cast of request arguments (reference: mr/models/kv/handler.py:79-106).
_ARGUMENT_CASTS = {
    "int": int,
    "float": float,
    "str": str,
    "unicode": str,  # py2 parity alias
    "bool": bool,
    "list": list,
    "dict": dict,
}


class CatalogError(ValueError):
    pass


@dataclass
class Handler:
    workflow_name: str
    name: str
    handler_type: str
    fn: object = None  # a Python callable (generator function)
    source_code: str | None = None
    argument_spec: list[tuple[str, str]] = field(default_factory=list)
    required_capability: str | None = None
    description: str = ""
    version: str = ""

    def __post_init__(self):
        if self.handler_type not in HANDLER_TYPES:
            raise CatalogError(f"bad handler_type {self.handler_type!r}")
        for _, type_name in self.argument_spec:
            if type_name not in _ARGUMENT_CASTS:
                raise CatalogError(f"unknown argument type {type_name!r}")
        if self.fn is None and self.source_code is None:
            raise CatalogError("handler needs fn or source_code")
        if not self.version:
            src = self.source_code or _safe_getsource(self.fn)
            self.version = hashlib.sha1(src.encode()).hexdigest()

    def cast_arguments(self, arguments: dict) -> list[tuple[str, object]]:
        """Validate + cast the request arguments against the spec, in
        spec order (the reference enumerates arguments in insertion
        order of the typed spec)."""
        if not self.argument_spec:
            return list(arguments.items())
        missing = [n for n, _ in self.argument_spec if n not in arguments]
        if missing:
            raise CatalogError(f"missing arguments: {missing}")
        extra = set(arguments) - {n for n, _ in self.argument_spec}
        if extra:
            raise CatalogError(f"unexpected arguments: {sorted(extra)}")
        out = []
        for arg_name, type_name in self.argument_spec:
            cast = _ARGUMENT_CASTS[type_name]
            try:
                out.append((arg_name, cast(arguments[arg_name])))
            except (TypeError, ValueError) as e:
                raise CatalogError(
                    f"argument {arg_name!r} not castable to {type_name}: {e}"
                ) from e
        return out


def _safe_getsource(fn) -> str:
    try:
        return inspect.getsource(fn)
    except (OSError, TypeError):
        return repr(fn)


@dataclass
class Step:
    workflow_name: str
    name: str
    map_handler_name: str
    reduce_handler_name: str
    combine_handler_name: str | None = None
    description: str = ""

    def __post_init__(self):
        names = [self.map_handler_name, self.reduce_handler_name]
        if self.combine_handler_name:
            names.append(self.combine_handler_name)
        if len(set(names)) != len(names):
            raise CatalogError("step handler names must be distinct")


@dataclass
class Job:
    workflow_name: str
    name: str
    initial_step_name: str
    description: str = ""


@dataclass
class Workflow:
    name: str
    description: str = ""
    # hash over all handler versions; bumped on registration so long-
    # running apps can see when handler code changed (reference:
    # handlers_state at mr/models/kv/workflow.py:9-27).
    handlers_state: str = ""
    # values injected into every handler scope of this workflow (the
    # reference's WorkflowScopeFactory — mr/handlers/scope.py:27-40,
    # example test/scope/test_scope.py:4-20). Must be picklable: they
    # ship to executors inside the UDF closures.
    scope_values: dict = field(default_factory=dict)


class Catalog:
    """Driver-side registry with the reference's entity CRUD surface."""

    def __init__(self):
        self._workflows: dict[str, Workflow] = {}
        self._jobs: dict[tuple[str, str], Job] = {}
        self._steps: dict[tuple[str, str], Step] = {}
        self._handlers: dict[tuple[str, str], Handler] = {}

    # -- workflows ---------------------------------------------------------
    def create_workflow(
        self, name: str, description: str = "", scope_values: dict | None = None
    ) -> Workflow:
        if name in self._workflows:
            raise CatalogError(f"workflow {name!r} exists")
        wf = Workflow(name, description, scope_values=scope_values or {})
        self._workflows[name] = wf
        return wf

    def get_workflow(self, name: str) -> Workflow:
        try:
            return self._workflows[name]
        except KeyError:
            raise CatalogError(f"no workflow {name!r}") from None

    def list_workflows(self) -> list[Workflow]:
        return list(self._workflows.values())

    def delete_workflow(self, name: str) -> None:
        """Refuses while child entities exist (delete those first) — a
        dangling (workflow, *) key space would orphan every lookup."""
        self.get_workflow(name)
        kinds = (
            ("handler", self._handlers),
            ("step", self._steps),
            ("job", self._jobs),
        )
        for kind, store in kinds:
            held = [n for (wf, n) in store if wf == name]
            if held:
                raise CatalogError(
                    f"workflow {name!r} still has {kind}s: {sorted(held)}"
                )
        del self._workflows[name]

    # -- handlers ----------------------------------------------------------
    def register_handler(self, handler: Handler) -> Handler:
        self.get_workflow(handler.workflow_name)
        self._handlers[(handler.workflow_name, handler.name)] = handler
        self._update_handlers_state(handler.workflow_name)
        return handler

    def get_handler(self, workflow_name: str, name: str) -> Handler:
        try:
            return self._handlers[(workflow_name, name)]
        except KeyError:
            raise CatalogError(f"no handler {name!r} in {workflow_name!r}") from None

    def list_handlers(self, workflow_name: str) -> list[Handler]:
        return [h for (wf, _), h in self._handlers.items() if wf == workflow_name]

    def delete_handler(self, workflow_name: str, name: str) -> None:
        self.get_handler(workflow_name, name)
        del self._handlers[(workflow_name, name)]
        self._update_handlers_state(workflow_name)

    def _update_handlers_state(self, workflow_name: str) -> None:
        versions = sorted(
            h.version for h in self.list_handlers(workflow_name)
        )
        self.get_workflow(workflow_name).handlers_state = hashlib.sha1(
            json.dumps(versions).encode()
        ).hexdigest()

    # -- steps -------------------------------------------------------------
    def create_step(
        self,
        workflow_name: str,
        name: str,
        map_handler_name: str,
        reduce_handler_name: str,
        combine_handler_name: str | None = None,
        description: str = "",
    ) -> Step:
        # handlers must exist and be of the right type (parity with
        # mr_kv_step_create's existence check).
        m = self.get_handler(workflow_name, map_handler_name)
        r = self.get_handler(workflow_name, reduce_handler_name)
        if m.handler_type != HT_MAPPER:
            raise CatalogError(f"{map_handler_name!r} is not a mapper")
        if r.handler_type != HT_REDUCER:
            raise CatalogError(f"{reduce_handler_name!r} is not a reducer")
        if combine_handler_name:
            c = self.get_handler(workflow_name, combine_handler_name)
            if c.handler_type != HT_COMBINER:
                raise CatalogError(f"{combine_handler_name!r} is not a combiner")
        step = Step(
            workflow_name, name, map_handler_name, reduce_handler_name,
            combine_handler_name, description,
        )
        self._steps[(workflow_name, name)] = step
        return step

    def get_step(self, workflow_name: str, name: str) -> Step:
        try:
            return self._steps[(workflow_name, name)]
        except KeyError:
            raise CatalogError(f"no step {name!r} in {workflow_name!r}") from None

    def list_steps(self, workflow_name: str) -> list[Step]:
        return [s for (wf, _), s in self._steps.items() if wf == workflow_name]

    def delete_step(self, workflow_name: str, name: str) -> None:
        """Refuses while a job points at the step as its initial step."""
        self.get_step(workflow_name, name)
        users = [
            j.name
            for (wf, _), j in self._jobs.items()
            if wf == workflow_name and j.initial_step_name == name
        ]
        if users:
            raise CatalogError(f"step {name!r} is initial step of jobs: {sorted(users)}")
        del self._steps[(workflow_name, name)]

    # -- jobs --------------------------------------------------------------
    def create_job(
        self, workflow_name: str, name: str, initial_step_name: str,
        description: str = "",
    ) -> Job:
        self.get_step(workflow_name, initial_step_name)
        job = Job(workflow_name, name, initial_step_name, description)
        self._jobs[(workflow_name, name)] = job
        return job

    def get_job(self, workflow_name: str, name: str) -> Job:
        try:
            return self._jobs[(workflow_name, name)]
        except KeyError:
            raise CatalogError(f"no job {name!r} in {workflow_name!r}") from None

    def list_jobs(self, workflow_name: str) -> list[Job]:
        return [j for (wf, _), j in self._jobs.items() if wf == workflow_name]

    def delete_job(self, workflow_name: str, name: str) -> None:
        self.get_job(workflow_name, name)
        del self._jobs[(workflow_name, name)]

    # -- persistence (optional JSON snapshot of the metadata) --------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "saved_at": time.time(),
                "workflows": [vars(w) for w in self._workflows.values()],
                "jobs": [vars(j) for j in self._jobs.values()],
                "steps": [vars(s) for s in self._steps.values()],
                "handlers": [
                    {k: v for k, v in vars(h).items() if k != "fn"}
                    for h in self._handlers.values()
                ],
            },
            indent=2,
        )

    def save(self, path: str) -> None:
        """Snapshot all entities to a JSON file (the reference persists
        every entity in etcd — mr/models/kv/model.py:370-385; a file is
        the single-driver equivalent)."""
        with open(path, "w", encoding="utf-8") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Catalog":
        """Rebuild a catalog from :meth:`save` output. Source-code
        handlers round-trip fully (the reference's KV-stored handlers
        are source strings); handlers registered as Python callables
        persist their metadata only and are restored as stubs whose
        invocation raises — re-register the callable to reactivate."""
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        cat = cls()
        for w in data["workflows"]:
            cat._workflows[w["name"]] = Workflow(**w)
        for h in data["handlers"]:
            if h.get("source_code") is None:
                def _missing(scope, payload, _name=h["name"]):
                    raise CatalogError(
                        f"handler {_name!r} was registered from a Python "
                        "callable; callables are not persisted — "
                        "re-register it"
                    )
                h = {**h, "fn": _missing}
            handler = Handler(**h)
            cat._handlers[(handler.workflow_name, handler.name)] = handler
        for s in data["steps"]:
            step = Step(**s)
            cat._steps[(step.workflow_name, step.name)] = step
        for j in data["jobs"]:
            job = Job(**j)
            cat._jobs[(job.workflow_name, job.name)] = job
        return cat
