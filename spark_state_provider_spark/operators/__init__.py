"""Operator inventory (SURVEY.md §2-C, Q1-Q30).

Each operator module registers its queries into the shared registry via
``spark_state_provider_spark.operators.registry.register``. The driver
contract (``__spark_entry__.py``) exposes the registry as
``queries()`` / ``oracle_sql()``.
"""

from spark_state_provider_spark.operators import registry  # noqa: F401


def load_all() -> None:
    """Import every operator module so all queries self-register."""
    from spark_state_provider_spark.operators import (  # noqa: F401
        asof,
        relational,
        dedup,
        graph,
        similarity,
        text,
        multimodal,
        pipeline,
        scale_patterns,
        sources_sinks,
        sql_surface,
        stateful_batch,
        streaming_queries,
        timeseries,
        tpch_suite,
    )
