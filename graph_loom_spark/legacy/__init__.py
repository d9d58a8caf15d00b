"""Legacy line-oriented DSL statements (reference query_interface.rs)."""
