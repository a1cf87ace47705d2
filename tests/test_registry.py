"""Workload-registry invariants the driver contract depends on."""

from laradb_spark.workloads import _PRIORITY, all_specs

DRIVER_ORACLE_WINDOW = 50  # the driver oracles only the first N registered


def test_priority_queries_inside_oracle_window():
    names = list(all_specs())
    head = set(names[:DRIVER_ORACLE_WINDOW])
    missing = [n for n in _PRIORITY if n not in head]
    assert not missing, f"priority queries outside the driver window: {missing}"


def test_spec_shapes():
    specs = all_specs()
    assert len(specs) == len(set(specs)) >= 70
    for name, (fn, sql) in specs.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name


def test_rows_only_queries_are_the_documented_ones():
    # every oracle-less query is a deliberate rows-only check, not an
    # accidentally-dropped oracle
    no_oracle = {n for n, (_f, sql) in all_specs().items() if sql is None}
    # approx_stats is the ONLY rows-only query (engine-specific sketches);
    # ann_ivf_topk gained a real oracle (unrolled Lloyd rounds in SQL)
    assert no_oracle == {"approx_stats"}
