"""Sources/sinks: snapshot persistence, exports, and the TPC-H graph projection."""
