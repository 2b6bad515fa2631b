"""Scalar / array function library (SURVEY.md §2.8).

Everything here is a *column expression builder* — pure JVM-side Spark
SQL expressions, no Python UDFs — so every function participates in
whole-stage codegen and never leaves the executor JVM."""
