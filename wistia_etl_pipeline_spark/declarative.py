"""Local executor for Spark 4.1 Declarative Pipelines definitions.

``pyspark.pipelines`` (SPARK-51727, Spark 4.1) is the public
declarative API for exactly the topology the reference hard-codes as
three Glue scripts: bronze ingest → silver conform → gold rollup
(wistia_pull_wistia_api.py / wistia_transform_silver.py /
wistia_load_redshift.py; SURVEY §3 EP1–EP3). Datasets are declared
with decorators (``@materialized_view``, ``@table``,
``@temporary_view``, ``create_streaming_table`` + ``@append_flow``)
and an engine materializes the dataflow graph.

The DEFINITION half of the API is pure Python over any session: the
decorators register :class:`~pyspark.pipelines.flow.Flow` and
``Output`` dataclasses into the active
:class:`~pyspark.pipelines.graph_element_registry.GraphElementRegistry`
via ``graph_element_registration_context``. The EXECUTION half that
ships with Spark (``spark-pipelines`` CLI →
``spark_connect_pipeline.start_run``) is Spark Connect-only: it drives
a gRPC dataflow-graph service, and this container has neither ``grpc``
nor ``protobuf`` (probed in ``tests/test_env_probes.py`` — the same
blocker that gates ``transformWithState``). So this module supplies
the thin local half: a :class:`LocalGraphElementRegistry` that
captures definitions through the PUBLIC registration context, and
:func:`materialize` which runs the captured flows on a classic
session in registration order — temporary views stay views, table
outputs become real (optionally partitioned) warehouse tables,
multiple append flows land in their shared target in declaration
order. The declarative SURFACE is therefore probed end-to-end and
oracle-checked; only the remote-execution transport is stubbed, and
honestly so.

Shape at 100 TB: the executor adds nothing to the plans — each flow's
DataFrame is exactly what the declaration returns, so partitioning,
pushdown, and AQE behave as in the imperative spelling. Registration
order stands in for the runner's dependency-driven scheduling; a flow
reading a dataset declared after it fails analysis loudly rather than
reordering silently (the medallion topology is declaration-ordered by
construction).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.pipelines.graph_element_registry import (
    GraphElementRegistry,
    graph_element_registration_context,
)
from pyspark.pipelines.flow import Flow
from pyspark.pipelines.output import (
    Output,
    Sink,
    Table,
    TemporaryView,
)


@dataclass
class LocalGraphElementRegistry(GraphElementRegistry):
    """Captures pipeline definitions made through the public
    ``pyspark.pipelines`` decorators, in declaration order."""

    outputs: list[Output] = field(default_factory=list)
    flows: list[Flow] = field(default_factory=list)
    sqls: list[tuple[str, object]] = field(default_factory=list)

    def register_output(self, output: Output) -> None:
        self.outputs.append(output)

    def register_flow(self, flow: Flow) -> None:
        self.flows.append(flow)

    def register_sql(self, sql_text: str, file_path) -> None:
        self.sqls.append((sql_text, file_path))


def definitions(registry: LocalGraphElementRegistry):
    """The public registration context, re-exported so call sites
    depend on this module only::

        reg = LocalGraphElementRegistry()
        with definitions(reg):
            @dp.materialized_view
            def bronze(): ...
    """
    return graph_element_registration_context(registry)


def materialize(
    spark: SparkSession, registry: LocalGraphElementRegistry
) -> dict[str, DataFrame]:
    """Run every captured flow against ``spark`` and return
    ``{output name: readable DataFrame}``.

    Semantics per output type (the runner's, minus the transport):

    * ``TemporaryView`` — the flow result becomes a temp view under
      the declared name (intra-pipeline staging; never materialized).
    * ``Table`` / ``MaterializedView`` / ``StreamingTable`` — each of
      the output's flows is written into a managed table under the
      declared name, honoring ``format`` and ``partition_cols``; the
      FIRST flow creates (overwrite), later flows append — so a
      ``create_streaming_table`` target with several ``@append_flow``
      definitions receives their union in declaration order.
    * ``Sink`` — rejected: an external sink has no local twin to
      verify against, and pretending otherwise would un-pin the
      contract.

    Callers own cleanup: :func:`drop` removes the tables and views a
    materialize created (uuid-suffixed names keep repeated runs in a
    shared session independent — the temp-view naming rule).
    """
    if registry.sqls:
        # Same honesty rule as the Sink guard below: a SQL-file-defined
        # dataset would otherwise be silently dropped (ADVICE r11).
        raise NotImplementedError(
            "local executor does not materialize SQL-file definitions"
        )
    by_target: dict[str, list[Flow]] = {}
    for fl in registry.flows:
        by_target.setdefault(fl.target, []).append(fl)
    out: dict[str, DataFrame] = {}
    for output in registry.outputs:
        if isinstance(output, Sink):
            raise NotImplementedError(
                "local executor does not materialize external sinks"
            )
        flows = by_target.get(output.name, [])
        if not flows:
            raise ValueError(f"output {output.name!r} has no flow")
        if isinstance(output, TemporaryView):
            if len(flows) != 1:
                raise ValueError(
                    f"temporary view {output.name!r} must have exactly one flow"
                )
            flows[0].func().createOrReplaceTempView(output.name)
            out[output.name] = spark.table(output.name)
            continue
        assert isinstance(output, Table)
        for i, fl in enumerate(flows):
            writer = fl.func().write.format(output.format or "parquet")
            if output.partition_cols:
                writer = writer.partitionBy(*output.partition_cols)
            writer.mode("overwrite" if i == 0 else "append").saveAsTable(
                output.name
            )
        out[output.name] = spark.table(output.name)
    return out


def drop(spark: SparkSession, registry: LocalGraphElementRegistry) -> None:
    """Remove everything :func:`materialize` created for ``registry``."""
    for output in registry.outputs:
        if isinstance(output, TemporaryView):
            spark.catalog.dropTempView(output.name)
        elif isinstance(output, Table):
            spark.sql(f"DROP TABLE IF EXISTS `{output.name}`")
