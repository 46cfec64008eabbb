from .flow import MathRecognition

__all__ = ["MathRecognition"]
