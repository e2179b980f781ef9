"""The north-rule transcript table schema (BASELINE.json input_hint).

One row per conversation turn. The stable-ordering invariant used by the
round-trip verifier is ``(conv_id, turn_idx)`` — the engine analogue of the
reference's index-aligned implode/backbone zipping assumption
(/root/reference/fhirflat/fhir2flat.py:89-115,
/root/reference/fhirflat/resources/base.py:228-236).
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string(), nullable=False),
        pa.field("text", pa.string(), nullable=False),
        pa.field("tool", pa.string(), nullable=False),
        pa.field("ts", pa.timestamp("us"), nullable=False),
    ]
)

#: The ordering key that defines "stable turn ordering" for verification.
ORDER_KEY = ("conv_id", "turn_idx")

#: Closed vocabularies observed in the domain — used by fixtures and as
#: codec-selection sanity expectations (dictionary/RLE targets).
ROLE_VOCAB = ("user", "assistant", "system", "tool")
TOOL_VOCAB = ("", "bash", "read", "grep", "edit", "write")
