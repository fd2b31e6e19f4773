from streamalert_spark.classify.classifier import Classifier, ClassifiedBatch, coerce_struct, glob_to_like

__all__ = ["Classifier", "ClassifiedBatch", "coerce_struct", "glob_to_like"]
