"""End-user pipelines: relational ops over the testdata star schema,
text/dedup/ANN operators over documents+embeddings, and the flagship
sidewalk + page-join geospatial pipelines."""
