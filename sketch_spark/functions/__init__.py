from sketch_spark.functions import arrays, hashing, text  # noqa: F401
