"""Framework exceptions.

The reference exposes a single ``FaceRecognitionException(BaseException)``
(reference: deep_insight_face/exceptions/face_exception.py:2-7 —
subclassing BaseException, which even escapes ``except Exception``).
Here the hierarchy derives from Exception, as library errors should.
"""

from __future__ import annotations


class FaceRecognitionException(Exception):
    """Base error for the framework (detection, alignment, embedding)."""

    def __init__(self, message: str = "face recognition error"):
        super().__init__(message)
        self.message = message


class NoFaceDetectedError(FaceRecognitionException):
    def __init__(self, message: str = "no face detected in image"):
        super().__init__(message)


class IdentityNotEnrolledError(FaceRecognitionException, KeyError):
    def __init__(self, identity: str):
        super().__init__(f"identity {identity!r} not enrolled")
        self.identity = identity


class InvalidPairsError(FaceRecognitionException, ValueError):
    """Malformed pairs.txt content (the reference references this name but
    never defines it — datagen/generator.py:12)."""
