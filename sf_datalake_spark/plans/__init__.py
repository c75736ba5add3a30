"""Physical-plan inspection utilities."""

from sf_datalake_spark.plans.inspect import (
    explain_formatted,
    plan_report,
)

__all__ = ["explain_formatted", "plan_report"]
