"""PySpark-native privacy-policy crawl/parse/tokenize analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
pipeline (rmjacobson/privacy-crawler-parser-tokenizer): a distributed
URL-frontier + fetch scheduler, HTML->span extraction, sentence
tokenization + quality rules, TF-IDF policy verification, corpus
statistics, and large-scale training-data operators (dedup, similarity
search, multimodal plumbing, text analysis).

Layout:
  core/       pure-Python kernels, shared verbatim by the sequential
              oracle and the Arrow-batched pandas UDFs (pins semantics)
  functions/  Spark column expressions + vectorized pandas UDFs
  operators/  dedup / similarity / text-analysis DataFrame operators
  sources/    table registry, synthetic fixture generators, warehouse
  plans/      frontier crawl scheduler, bloom filter, robots gate
  streaming/  Structured Streaming over the events table
"""

__version__ = "0.1.0"
