"""Query-planning layer: the thin API semantics the reference implements
above its SQL engine (table resolution, default time window, aliasing) —
everything below this layer is Spark SQL/Catalyst."""
