"""Shared physical-plan probes for tests."""


def scan_num_files(df, col_marker: str) -> int:
    """numFiles metric of the executed FileScan whose output columns
    contain ``col_marker`` (post-execution, so partition pruning is
    reflected; toString truncates file locations, so match on a column).
    Walks through AQE wrappers: AdaptiveSparkPlanExec holds the final
    plan, QueryStageExec nodes hold materialized subplans."""
    nodes = []

    def walk(node):
        nodes.append(node)
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.finalPhysicalPlan())
        if name.endswith("QueryStageExec"):
            walk(node.plan())
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    for node in nodes:
        if node.getClass().getSimpleName() == "FileSourceScanExec" and col_marker in node.toString().split("]")[0]:
            return node.metrics().apply("numFiles").value()
    raise AssertionError(f"no FileScan outputting {col_marker!r} found in executed plan")
