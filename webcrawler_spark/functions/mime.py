"""MIME / type-code maps (X1, X2) — single source of truth shared by the
Spark expressions and the Python simulator so both sides stay in lockstep.

* ``IMAGE_MIME`` replicates the reference's 16-case extension→MIME switch
  *including its quirks* (``svn`` → image/svg+xml, the ``image/apgn`` typo)
  for output equality (DatabaseHandler.java:280-310, SURVEY.md X2).
* ``CONTENT_TYPE_TO_DATA_TYPE`` is the 5-way MIME→DATA_TYPE switch
  (DatabaseHandler.java:230-247, SURVEY.md X1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

IMAGE_MIME = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "jfif": "image/jpeg",
    "pjpeg": "image/jpeg",
    "pjp": "image/jpeg",
    "png": "image/png",
    "apng": "image/apgn",       # reference typo kept verbatim (X2)
    "gif": "image/gif",
    "bmp": "image/bmp",
    "ico": "image/x-icon",
    "cur": "image/x-icon",
    "tif": "image/tiff",
    "tiff": "image/tiff",
    "webp": "image/webp",
    "svg": "image/svg+xml",
    "svn": "image/svg+xml",     # reference quirk kept verbatim (X2)
}
IMAGE_MIME_DEFAULT = "image/unknown"

CONTENT_TYPE_TO_DATA_TYPE = {
    "application/pdf": "PDF",
    "application/msword": "DOC",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": "DOCX",
    "application/vnd.ms-powerpoint": "PPT",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation": "PPTX",
}


def _case_chain(col: Column, mapping: dict[str, str], default: str) -> Column:
    expr = None
    for k, v in mapping.items():
        expr = F.when(col == k, v) if expr is None else expr.when(col == k, v)
    return expr.otherwise(default)


def image_mime(ext: Column) -> Column:
    """X2 as a Catalyst CASE WHEN chain."""
    return _case_chain(F.lower(ext), IMAGE_MIME, IMAGE_MIME_DEFAULT)


def data_type_code(content_type: Column) -> Column:
    """X1 as a Catalyst CASE WHEN chain (unmatched → null, as the reference
    falls through its switch)."""
    expr = None
    for k, v in CONTENT_TYPE_TO_DATA_TYPE.items():
        expr = F.when(content_type == k, v) if expr is None else expr.when(content_type == k, v)
    return expr


def image_mime_py(ext: str) -> str:
    return IMAGE_MIME.get(ext.lower(), IMAGE_MIME_DEFAULT)


def data_type_code_py(content_type: str | None) -> str | None:
    """X1 Python twin (simulator oracle)."""
    if content_type is None:
        return None
    return CONTENT_TYPE_TO_DATA_TYPE.get(content_type)
