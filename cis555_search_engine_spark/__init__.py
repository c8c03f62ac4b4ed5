"""cis555_search_engine_spark — a PySpark-native full-text search engine.

A from-scratch rebuild (NOT a port) of the data-processing capabilities of
the reference `yezhengli-Mr9/cis555-search-engine` (a 2020 CIS555 team
project: StormLite crawler -> MySQL inverted index -> tf-idf + pagerank
ranking), re-expressed Spark-first:

- corpus        = Iceberg/parquet table of multi-turn transcripts
                  (conv_id, turn_idx, role, text, tool, ts); a "document"
                  is one turn, identity (conv_id, turn_idx)
- index build   = tokenize (vectorized pandas UDF, reference semantics of
                  indexer/Indexer.java:345-392) -> explode -> Porter stem via
                  distinct-vocab broadcast join (the reference's `stemmer`
                  table trick, indexer/stem.java:74-157) -> native groupBy
                  aggregation into postings + doc/corpus statistics
- physical fmt  = doc_id-range-aligned posting blocks, delta+varint
                  compressed, per-block max-impact (block-max WAND)
- query         = broadcast semi-join on query terms -> BM25 / reference
                  tf-idf scoring -> distributed top-k (TakeOrderedAndProject)

Everything is DataFrame/SQL + Arrow-vectorized pandas UDFs; no per-row
Python anywhere in the hot path.
"""

__version__ = "0.1.0"
