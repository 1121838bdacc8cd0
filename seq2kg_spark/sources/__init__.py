from seq2kg_spark.sources.pages import PAGES_SCHEMA, read_pages, build_pages_corpus  # noqa: F401
