"""Training-data pipeline functions over the documents/embeddings tables:
text analysis, deduplication, similarity search, multimodal plumbing.
All hot paths are built-in column expressions (JVM, whole-stage codegen);
pandas UDFs appear only where array semantics genuinely require them."""
