"""Reusable Column-level expression builders (JVM-side, codegen-friendly)."""
