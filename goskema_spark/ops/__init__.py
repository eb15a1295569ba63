"""Training-data pipeline operators (north-star scope beyond the
reference's validators): deduplication, similarity search, text analysis,
multimodal column plumbing.

All hot paths are built-in Spark expressions (JVM, codegen); Python
appears only in the multimodal mapInPandas stubs where a real decoder
library would sit.
"""
