"""User-facing codec plug-in registry.

The Ray-Data-native analogue of the reference's extension-validator registry
(/root/reference/fhirflat/resources/extension_validators.py:55-87, where 15
extension classes at resources/extensions.py:24-737 register themselves by
name and the dispatch consults the table): third-party code extends the
column format by REGISTERING, never by editing ``codecs/core.py``.

    register_codec("xordelta", encode_fn, decode_fn, estimate_fn)

Contract (all three callables must be cloudpickle-able — top-level or
closure-defined functions both work):

- ``encode_fn(arr: pa.Array) -> (header: dict, blob: bytes) | None`` —
  return ``None`` to decline the column (dispatch falls through to the next
  plug-in, then the built-ins). The header must be JSON-safe. The codec owns
  the FULL round trip including nulls: whatever array it accepts, its
  decoder must reproduce bit-identically (type, values, null/empty
  distinction).
- ``decode_fn(header: dict, blob: bytes, n: int) -> pa.Array`` — receives
  exactly the header/blob ``encode_fn`` produced.
- ``estimate_fn(arr) -> int | None`` (optional) — a CHEAP pre-gate: return
  ``None`` to skip the codec without paying for a full encode, or a byte
  estimate to proceed. When absent, ``encode_fn`` is always attempted.

Worker propagation: Ray Data captures the current ``DataContext`` when a
Dataset is CREATED (``ExecutionPlan`` copies it at read time) and ships
that copy with every task, so the registry mirrors itself into a
DataContext config entry (cloudpickled) on every mutation; worker
processes lazily install it on their first
``encode_column``/``decode_column`` call. Registration on the driver
therefore reaches every map_batches worker of datasets created AFTER the
``register_codec`` call — register before building the pipeline (a lazy
Dataset constructed earlier keeps its pre-registration context and will
not see the plug-in). Plug-in codecs registered at encode
time must also be registered (or reachable via the same DataContext) at
decode time; a segment whose header names an unknown plug-in fails decode
with an actionable error rather than corrupting data.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import pyarrow as pa

__all__ = ["register_codec", "unregister_codec", "registered_codecs", "CodecSpec"]

#: header tag prefix for plug-in-coded columns ("x:<name>")
CUSTOM_PREFIX = "x:"
_CONFIG_KEY = "fhirflat_ray_codec_registry"


class CodecSpec(NamedTuple):
    encode_fn: Callable[[pa.Array], "tuple[dict, bytes] | None"]
    decode_fn: Callable[[dict, bytes, int], pa.Array]
    estimate_fn: "Callable[[pa.Array], int | None] | None"


_CODECS: dict[str, CodecSpec] = {}
#: last DataContext blob installed in THIS process (sync-skip token)
_installed_blob: bytes | None = None
#: True once THIS process called register/unregister directly (an owner);
#: owners never have their local registrations cleared by context sync
_owns_registry = False


def register_codec(
    name: str,
    encode_fn: Callable,
    decode_fn: Callable,
    estimate_fn: Callable | None = None,
) -> None:
    """Register a plug-in codec under ``name`` (see module docstring)."""
    global _owns_registry
    if not name or ":" in name or "/" in name:
        raise ValueError(f"codec name must be non-empty without ':' or '/': {name!r}")
    _owns_registry = True
    _CODECS[name] = CodecSpec(encode_fn, decode_fn, estimate_fn)
    _publish()


def unregister_codec(name: str) -> None:
    """Remove a plug-in codec. Segments already written with it will fail
    decode until it is registered again — unregister is a dev convenience,
    not a data-lifecycle operation."""
    global _owns_registry
    _owns_registry = True
    _CODECS.pop(name, None)
    _publish()


def registered_codecs() -> dict[str, CodecSpec]:
    """Read-only view of the current registry (post-sync)."""
    _sync_from_context()
    return dict(_CODECS)


def _publish() -> None:
    """Mirror the registry into the DataContext so Ray Data ships it to
    worker processes with every task. Best-effort: pure-local library use
    (no DataContext available) still works via the process-local dict."""
    global _installed_blob
    try:
        from ray import cloudpickle
        from ray.data import DataContext

        blob = cloudpickle.dumps(dict(_CODECS))
        DataContext.get_current().set_config(_CONFIG_KEY, blob)
        _installed_blob = blob
    except Exception:
        pass


def _sync_from_context() -> None:
    """Install the driver-published registry in this process if it changed.

    Called from the encode/decode dispatch hot path, so the common cases are
    O(1): no DataContext entry, or a blob we already installed (identity,
    then equality, comparison on the bytes)."""
    global _installed_blob
    try:
        from ray.data import DataContext

        blob = DataContext.get_current().get_config(_CONFIG_KEY, None)
    except Exception:
        return
    if blob is None:
        # A reused worker may run a task of a dataset created BEFORE any
        # registration (its context has no entry): clear whatever a prior
        # dataset's sync installed, or its blocks would mix plug-in-coded
        # columns other workers can't produce. Owners (processes that called
        # register_codec themselves) keep their local registrations.
        if _installed_blob is not None and not _owns_registry:
            _CODECS.clear()
            _installed_blob = None
        return
    if blob is _installed_blob or blob == _installed_blob:
        return
    from ray import cloudpickle

    # REPLACE, don't merge: the driver's registry is authoritative, so an
    # unregister_codec on the driver also clears long-lived reused workers
    _CODECS.clear()
    _CODECS.update(cloudpickle.loads(blob))
    _installed_blob = blob


def try_custom_encode(arr: pa.Array) -> "tuple[dict[str, Any], bytes] | None":
    """Offer ``arr`` to every registered codec in registration order; the
    first acceptance wins. Returns the wrapped (header, blob) or None."""
    _sync_from_context()
    if not _CODECS:
        return None
    for name, spec in _CODECS.items():
        if spec.estimate_fn is not None and spec.estimate_fn(arr) is None:
            continue
        enc = spec.encode_fn(arr)
        if enc is None:
            continue
        sub_hdr, blob = enc
        return {"c": CUSTOM_PREFIX + name, "n": len(arr), "t": str(arr.type), "x": sub_hdr}, blob
    return None


def custom_decode(hdr: dict[str, Any], blob: bytes) -> pa.Array:
    """Decode a plug-in-coded column; actionable error when unregistered."""
    _sync_from_context()
    name = hdr["c"][len(CUSTOM_PREFIX) :]
    spec = _CODECS.get(name)
    if spec is None:
        raise ValueError(
            f"column was encoded with plug-in codec {name!r} which is not "
            "registered in this process — call fhirflat_ray.codecs."
            f"register_codec({name!r}, ...) before decoding"
        )
    return spec.decode_fn(hdr["x"], blob, hdr["n"])
