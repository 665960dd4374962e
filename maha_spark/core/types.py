"""Data types for the semantic layer.

Re-expresses the reference's type system (maha `core/.../DataType.scala`)
on Spark's type system. The key non-obvious feature is ``StaticMapping``
(DataType.scala:43-64): an enum mapping from raw stored values to display
labels with a default label, which must support both directions:

* projection: raw value -> label (a generated CASE WHEN chain, JVM-side)
* filtering:  label -> IN(list of raw values) via the reverse map, where a
  non-unique reverse map expands to multiple raw values
  (DataType.scala:25,44-45 ``reverseStaticMapping``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Optional

from pyspark.sql import types as T


@dataclass(frozen=True)
class StaticMapping:
    """Raw-value -> label enum with a default label for unmapped values."""

    mapping: Mapping[Any, str]
    default: str

    @property
    def reverse(self) -> dict[str, list[Any]]:
        rev: dict[str, list[Any]] = {}
        for k, v in self.mapping.items():
            rev.setdefault(v, []).append(k)
        return rev

    def labels(self) -> set[str]:
        return set(self.mapping.values()) | {self.default}


@dataclass(frozen=True)
class DataType:
    """Base class; subclasses mirror the reference's 6 types."""

    static_mapping: Optional[StaticMapping] = None
    default_value: Any = None  # used for coalesce() on missing fact rows

    def __post_init__(self) -> None:
        # the base fields come first in the dataclass signature, so a
        # positional call like DecType(10, 2) would silently bind
        # static_mapping=10 — make that a loud error
        if self.static_mapping is not None and \
                not isinstance(self.static_mapping, StaticMapping):
            raise TypeError(
                f"static_mapping must be a StaticMapping, got "
                f"{self.static_mapping!r} — pass length/scale by keyword")

    def spark_type(self) -> T.DataType:  # pragma: no cover - abstract
        raise NotImplementedError

    @property
    def has_static_mapping(self) -> bool:
        return self.static_mapping is not None


@dataclass(frozen=True)
class IntType(DataType):
    length: int = 0
    min_value: Optional[int] = None
    max_value: Optional[int] = None

    def spark_type(self) -> T.DataType:
        return T.LongType()


@dataclass(frozen=True)
class StrType(DataType):
    length: int = 0
    is_binary: bool = False

    def spark_type(self) -> T.DataType:
        return T.BinaryType() if self.is_binary else T.StringType()


@dataclass(frozen=True)
class DecType(DataType):
    length: int = 0
    scale: int = 0
    min_value: Optional[float] = None
    max_value: Optional[float] = None

    def spark_type(self) -> T.DataType:
        # Physical storage may be double; DecimalType is the declared
        # semantic type when (length, scale) given.
        if self.length:
            return T.DecimalType(self.length, self.scale or 0)
        return T.DoubleType()


@dataclass(frozen=True)
class DateType(DataType):
    format: Optional[str] = None

    def spark_type(self) -> T.DataType:
        return T.DateType()


@dataclass(frozen=True)
class TimestampType(DataType):
    format: Optional[str] = None

    def spark_type(self) -> T.DataType:
        return T.TimestampType()


@dataclass(frozen=True)
class PassthroughType(DataType):
    def spark_type(self) -> T.DataType:
        return T.StringType()


class BinType(DataType):
    """Opaque binary payload (sketch partials, multimodal blobs)."""

    def spark_type(self) -> T.DataType:
        return T.BinaryType()
