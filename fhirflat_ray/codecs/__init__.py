"""Pure per-column lightweight codecs (no Ray dependency).

Each codec encodes one Arrow array to ``(header: JSON-safe dict, blob: bytes)``
and decodes back bit-identically. Codec auto-selection is statistics-driven:
exact candidate byte-costs are computed from cheap stats (cardinality, run
count, bit widths) and the argmin wins, with PLAIN as the universal fallback —
the engine analogue of the reference's data-dependent flatten-vs-``_dense``
branch (/root/reference/fhirflat/fhir2flat.py:56-65).
"""

from fhirflat_ray.codecs.core import decode_column, encode_column
from fhirflat_ray.codecs.registry import (
    register_codec,
    registered_codecs,
    unregister_codec,
)

__all__ = [
    "encode_column",
    "decode_column",
    "register_codec",
    "unregister_codec",
    "registered_codecs",
]
