from imageduplicatefinder_spark.sources.generator import (
    GeneratedCorpus,
    generate_corpus,
    corpus_to_dataframe,
)
from imageduplicatefinder_spark.sources.tables import load_table, load_testdata

__all__ = [
    "GeneratedCorpus",
    "generate_corpus",
    "corpus_to_dataframe",
    "load_table",
    "load_testdata",
]
