"""Cross-run determinism attestation (VERDICT r9 #6).

The driver's oracle gate runs every query ONCE and hash-compares it to
DuckDB — it cannot see a query that is right-on-average but
nondeterministic (a shuffle-order-sensitive reduction, an uncontrolled
float sum, an uncanonicalized collect ordering): such a query could
gate green one round and flake the next. This test runs the FULL
registry twice in one session — two complete passes, not back-to-back
per query, so cross-query state leakage (shared caches, scratch dirs,
session config drift) is also in scope — and requires the canonical
result hash to be identical both times.

sf0.001 keeps the two passes CI-cheap; the determinism devices under
test (scaled-integer arithmetic, canonical tie-breaks, decimal sums)
are data-scale-independent, so a flake would show here first.
"""


def test_registry_double_run_hash_stable(spark, sf_dir):
    from jobx_spark.oracle import result_hash
    from jobx_spark.queries import all_queries

    qs = all_queries()
    first: dict[str, str] = {}
    for name, fn in qs.items():
        first[name] = result_hash(fn(spark, sf_dir))
    unstable = []
    for name, fn in qs.items():
        if result_hash(fn(spark, sf_dir)) != first[name]:
            unstable.append(name)
    assert not unstable, (
        f"nondeterministic results across two runs: {unstable}"
    )
    assert len(first) == len(qs)
