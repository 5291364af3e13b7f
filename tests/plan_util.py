"""Shared physical-plan inspection helper for the plan-shape tests.

One definition for all test modules: `explainString` reaches into JVM
internals (`df._sc._jvm`) that have churned across Spark majors, so a
version bump is a single edit here."""

from __future__ import annotations


def plan_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
