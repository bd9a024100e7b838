"""Wiring guards for the driver contract: every bench query must be
registered, every oracle key must have a query, the library must never
call ray.init at import time (the driver owns the session), and every
registered callable must be importable. These catch the
forgot-to-register / renamed-one-side mistakes that otherwise surface
only inside the driver's correctness run."""

from __future__ import annotations

import ast
import os


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_bench_query_is_registered():
    import bench

    import __ray_entry__ as e

    registered = set(e.queries())
    missing = [q for q in bench.BENCH_QUERIES if q not in registered]
    assert not missing, f"bench names not in queries(): {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES), "dup bench names"


def test_every_oracle_key_has_a_query():
    import __ray_entry__ as e

    queries, oracles = set(e.queries()), set(e.oracle_sql())
    orphans = sorted(oracles - queries)
    assert not orphans, f"oracle_sql keys without queries(): {orphans}"


def test_rows_only_remainder_is_the_documented_set():
    import __ray_entry__ as e

    rows_only = sorted(set(e.queries()) - set(e.oracle_sql()))
    assert rows_only == [
        "approx_distinct_users",
        "crawl_status_counts",
        "crawl_trace",
        "image_visual_clusters_parallel",
    ], rows_only


def test_library_never_calls_ray_init_at_module_level():
    """Walk every library module's AST: `ray.init` may appear only inside
    function bodies guarded by the script/CLI layers — never at module
    scope (the driver imports these with its own session active)."""
    pkg = os.path.join(_repo_root(), "mklab_focused_crawler_ray")
    offenders = []
    for dirpath, _dirs, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            tree = ast.parse(open(path).read(), filename=path)
            for node in tree.body:  # module-level statements only
                if isinstance(
                    node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
                ):
                    continue  # bodies run only when called, under a session
                for sub in ast.walk(node):
                    if (
                        isinstance(sub, ast.Call)
                        and isinstance(sub.func, ast.Attribute)
                        and sub.func.attr == "init"
                        and isinstance(sub.func.value, ast.Name)
                        and sub.func.value.id == "ray"
                    ):
                        offenders.append(path)
    assert not offenders, f"module-level ray.init in: {offenders}"


def test_all_registered_queries_are_callables():
    import __ray_entry__ as e

    bad = [k for k, v in e.queries().items() if not callable(v)]
    assert not bad, bad
