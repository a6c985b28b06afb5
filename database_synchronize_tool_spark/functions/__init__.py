"""Scalar expression library (JVM-side Column expressions; pandas UDFs only
where built-ins can't express the semantics)."""
