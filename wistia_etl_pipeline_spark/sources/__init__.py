"""Sources & sinks: schema'd JSON readers, REST paginated source,
partitioned writers, control-file state store."""
