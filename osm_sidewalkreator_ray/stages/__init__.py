"""Per-stage Ray Data transforms: actor-pool parsers and vectorized
batch maps used by the pipelines."""
