from dataforge_core_spark.plans.planner import (  # noqa: F401
    SourcePlan,
    JoinElement,
    RuleElement,
    plan_source,
)
