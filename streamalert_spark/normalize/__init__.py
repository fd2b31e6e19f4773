from streamalert_spark.normalize.normalizer import NormalizationSpec, Normalizer
from streamalert_spark.normalize.artifacts import extract_artifacts

__all__ = ["NormalizationSpec", "Normalizer", "extract_artifacts"]
