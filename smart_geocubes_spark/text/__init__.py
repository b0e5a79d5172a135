from smart_geocubes_spark.text.extract import extract_text, extract_text_batch

__all__ = ["extract_text", "extract_text_batch"]
