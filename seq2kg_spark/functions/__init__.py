from seq2kg_spark.functions.text_clean import clean_text_expr, clean_text_py  # noqa: F401
