"""Large-scale data-pipeline operators (beyond-reference surface):
relational analytics, windowed/sessionized event processing, text
analysis, deduplication, and similarity search — all built on
DataFrame/Catalyst primitives, designed for 100 TB-class inputs."""
