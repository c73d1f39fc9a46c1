from amcpy_tpu.models.classifier import AMCClassifier

__all__ = ["AMCClassifier"]
