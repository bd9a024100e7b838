"""Config-driven pipeline builder — the user-extension surface.

The reference assembles topologies from XML: spouts/bolts resolved by
classpath name with per-stage parallelism hints
(``config/CrawlerConfiguration.java:25-311``, ``conf/crawler.conf.xml``
Storages/Filters/Processors/Streams sections; ``Crawler.java:120-217``).

Ray-native equivalent: a declarative dict (parse it from TOML/YAML/JSON —
the builder takes the parsed dict) describing source → named stages → sink,
each stage a dotted-path Python callable (function or callable class) with
``map_batches`` options. Example::

    spec = {
      "source": {"parquet": "/data/documents.parquet", "columns": ["doc_id", "text"]},
      "stages": [
        {"name": "simhash",
         "fn": "mklab_focused_crawler_ray.pipelines.queries:_token_partial",
         "batch_format": "pyarrow"},
      ],
      "sink": {"parquet": "/tmp/out"},
    }
    Pipeline.from_spec(spec).run()

A stage entry supports: ``fn`` (dotted path "module:attr" or a callable),
``kind`` ("map_batches" default | "filter" | "flat_map" | "sort" | "limit"),
``batch_format``, ``batch_size``, ``concurrency``, ``fn_kwargs`` /
``fn_constructor_kwargs`` (class stages become actor pools — the reference's
parallelism hint maps to ``concurrency``).
"""

from __future__ import annotations

import importlib
import inspect
from dataclasses import dataclass, field
from typing import Any, Callable


def resolve(path_or_fn) -> Callable:
    """'pkg.mod:attr' → the attribute; callables pass through (mirrors the
    reference's Class.forName plugin loading, CrawlerConfiguration.java)."""
    if callable(path_or_fn):
        return path_or_fn
    mod, _, attr = str(path_or_fn).partition(":")
    if not attr:
        mod, _, attr = str(path_or_fn).rpartition(".")
    obj = importlib.import_module(mod)
    for part in attr.split("."):
        obj = getattr(obj, part)
    return obj


@dataclass
class Stage:
    name: str
    fn: Any = None
    kind: str = "map_batches"
    options: dict = field(default_factory=dict)

    @classmethod
    def from_spec(cls, spec: dict) -> "Stage":
        spec = dict(spec)
        name = spec.pop("name")
        kind = spec.pop("kind", "map_batches")
        fn = spec.pop("fn", None)
        return cls(name=name, fn=fn, kind=kind, options=spec)

    def apply(self, ds):
        if self.kind == "map_batches":
            fn = resolve(self.fn)
            opts = dict(self.options)
            # callable classes become actor pools; default their concurrency
            if inspect.isclass(fn) and "concurrency" not in opts:
                opts["concurrency"] = (1, 4)
            return ds.map_batches(fn, **opts)
        if self.kind == "filter":
            return ds.filter(resolve(self.fn), **self.options)
        if self.kind == "flat_map":
            return ds.flat_map(resolve(self.fn), **self.options)
        if self.kind == "sort":
            return ds.sort(**self.options)
        if self.kind == "limit":
            return ds.limit(self.options["limit"])
        if self.kind == "select_columns":
            return ds.select_columns(self.options["columns"])
        raise ValueError(f"unknown stage kind {self.kind!r} (stage {self.name!r})")


@dataclass
class Pipeline:
    source: dict
    stages: list[Stage]
    sink: dict | None = None

    @classmethod
    def from_spec(cls, spec: dict) -> "Pipeline":
        return cls(
            source=spec["source"],
            stages=[Stage.from_spec(s) for s in spec.get("stages", [])],
            sink=spec.get("sink"),
        )

    def dataset(self):
        import ray.data as rd

        src = dict(self.source)
        if "parquet" in src:
            ds = rd.read_parquet(src["parquet"], columns=src.get("columns"))
        elif "items" in src:
            ds = rd.from_items(src["items"])
        else:
            raise ValueError(f"unknown source {self.source!r}")
        for st in self.stages:
            ds = st.apply(ds)
        return ds

    def run(self):
        """Execute; write to the sink if configured, else return the Dataset."""
        ds = self.dataset()
        if self.sink and "parquet" in self.sink:
            ds.write_parquet(self.sink["parquet"])
            return self.sink["parquet"]
        return ds
