from xova_spark.plans.inspect import (  # noqa: F401
    broadcast_hint_count,
    broadcast_join_count,
    exchange_count,
    executed_plan,
    plan_stats,
    pushed_filters,
    read_schema_columns,
    sortmerge_join_count,
    wholestage_codegen_spans,
)
