"""Per-resource ``TableConfig`` catalog — the engine-side analogue of the
reference's 13 concrete resource classes (``flat_exclusions`` /
``flat_defaults`` / ``cleanup()``, /root/reference/fhirflat/resources/*.py).

The reference's ``cleanup`` hooks operate on the FLAT row dict right before
expansion (reference-wrap ``data[f] = {"reference": data[f]}``, id
stringification, date truncation, re-adding stripped defaults). In flat
COLUMN space those are all vectorized Arrow operations:

- reference-wrap  = renaming flat column ``f`` to ``f.reference`` (the
  subsequent unflatten builds the struct);
- id cast / date truncation = one ``pc.cast`` / regex slice per column;
- flat defaults   = appending a constant column when absent.

:func:`cleanup_flat_batch` applies them per batch (no shuffle, usable in
``ds.map_batches``); :data:`RESOURCE_CONFIGS` holds one worked config per
reference resource, with exclusions/defaults/cleanup sets transcribed from
the cited class bodies.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from fhirflat_ray.stages.flatten import TableConfig

#: attributes every resource strips (reference ``FHIRFlatBase.flat_exclusions``,
#: /root/reference/fhirflat/resources/base.py:23-30)
BASE_EXCLUSIONS: tuple[str, ...] = (
    "meta",
    "implicitRules",
    "language",
    "text",
    "contained",
    "modifierExtension",
)


@dataclass
class ResourceConfig(TableConfig):
    """``TableConfig`` plus the reference's cleanup-on-flat-dict surface.

    ``reference_fields`` are wrapped as ``{"reference": value}`` structs on
    expansion; ``string_cast_fields`` are cast to string (the reference's
    ``str(data[f])``); ``date_truncate_fields`` drop any time component
    (``value.split("T")[0]``, patient.py:78-80); ``flat_defaults`` are
    constant flat columns re-added when absent (encounter.py:106 etc.)."""

    reference_fields: tuple[str, ...] = ()
    string_cast_fields: tuple[str, ...] = ()
    date_truncate_fields: tuple[str, ...] = ()
    flat_defaults: dict[str, Any] = field(default_factory=dict)


def cleanup_flat_batch(batch: pa.Table, config: ResourceConfig) -> pa.Table:
    """Vectorized ``cleanup()`` in flat-column space (per batch, no shuffle).

    Mirrors the reference order: casts → truncations → reference wraps →
    defaults. Columns named in the config but absent from the batch are
    skipped (the reference's ``.intersection(data.keys())``); columns
    already ending in ``.reference`` are left alone (the reference's
    ``{x for x in data if x.endswith(".reference")}`` arm is the identity
    here, since the wrap is a rename)."""
    names = batch.column_names
    for f in config.string_cast_fields:
        if f in names:
            i = batch.column_names.index(f)
            batch = batch.set_column(i, f, pc.cast(batch[f], pa.string()))
    for f in config.date_truncate_fields:
        if f in names:
            i = batch.column_names.index(f)
            col = pc.cast(batch[f], pa.string())
            first = pc.list_element(pc.split_pattern(col, "T", max_splits=1), 0)
            batch = batch.set_column(i, f, first)
    renames = {
        f: f + ".reference"
        for f in config.reference_fields
        if f in names and not f.endswith(".reference")
    }
    if renames:
        batch = batch.rename_columns(
            [renames.get(c, c) for c in batch.column_names]
        )
    for name, default in config.flat_defaults.items():
        if name not in batch.column_names:
            batch = batch.append_column(
                name, pa.array([default] * batch.num_rows)
            )
    return batch


def _cfg(
    exclude: tuple[str, ...] = (),
    refs: tuple[str, ...] = (),
    casts: tuple[str, ...] = (),
    dates: tuple[str, ...] = (),
    defaults: dict[str, Any] | None = None,
) -> ResourceConfig:
    return ResourceConfig(
        exclude=BASE_EXCLUSIONS + exclude,
        reference_fields=refs,
        string_cast_fields=casts,
        date_truncate_fields=dates,
        flat_defaults=defaults or {},
    )


#: the clinical-status system used by the condition default
#: (/root/reference/fhirflat/resources/condition.py:102-111), in the
#: engine's condensed ``system|code`` convention
_CONDITION_CLINICAL = "http://terminology.hl7.org/CodeSystem/condition-clinical|unknown"

#: One entry per concrete reference resource class; line references point at
#: the ``flat_exclusions`` / ``flat_defaults`` / ``cleanup`` definitions the
#: entry transcribes.
RESOURCE_CONFIGS: dict[str, ResourceConfig] = {
    # patient.py:41-82 (exclusions; cleanup: id str cast + birthDate truncation)
    "patient": _cfg(
        exclude=(
            "identifier", "active", "name", "telecom", "address", "photo",
            "contact", "communication", "link",
        ),
        casts=("id",),
        dates=("birthDate",),
    ),
    # encounter.py:48-108 (exclusions, status default, reference wraps)
    "encounter": _cfg(
        exclude=(
            "identifier", "participant", "appointment", "account",
            "dietPreference", "specialArrangement", "specialCourtesy",
        ),
        refs=(
            "subject", "episodeOfCare", "basedOn", "careTeam", "partOf",
            "serviceProvider", "admission.destination", "admission.origin",
        ),
        defaults={"status": "completed"},
    ),
    # condition.py:55-113 (exclusions, clinicalStatus default, subject/encounter wraps)
    "condition": _cfg(
        exclude=(
            "id", "identifier", "verificationStatus", "evidence", "note",
            "participant",
        ),
        refs=("subject", "encounter"),
        defaults={"clinicalStatus.code": _CONDITION_CLINICAL},
    ),
    # observation.py:80-133 (exclusions, status default, str-cast reference wraps)
    "observation": _cfg(
        exclude=(
            "id", "identifier", "instantiatesCanonical", "instantiatesReference",
            "basedOn", "focus", "referenceRange", "issued", "note",
        ),
        refs=("encounter", "subject", "performer", "bodyStructure", "specimen", "device"),
        casts=("encounter", "subject", "performer", "bodyStructure", "specimen", "device"),
        defaults={"status": "final"},
    ),
    # procedure.py:59-125
    "procedure": _cfg(
        exclude=(
            "id", "identifier", "instantiatesCanonical", "instantiatesUri",
            "basedOn", "statusReason", "focus", "reportedBoolean",
            "reportedReference", "performer", "reason", "note", "supportingInfo",
        ),
        refs=("partOf", "encounter", "subject", "recorder", "location", "report"),
        defaults={"status": "completed"},
    ),
    # medicationadministration.py:20-57
    "medicationadministration": _cfg(
        exclude=("id", "identifier", "basedOn", "performer", "note"),
        refs=(
            "basedOn", "partOf", "subject", "encounter",
            "supportingInformation", "request", "eventHistory",
        ),
        defaults={"status": "completed"},
    ),
    # medicationstatement.py:19-50
    "medicationstatement": _cfg(
        exclude=("id", "identifier", "informationSource", "note"),
        refs=(
            "partOf", "subject", "encounter", "derivedFrom",
            "relatedClinicalInformation",
        ),
        defaults={"status": "recorded"},
    ),
    # immunization.py:51-104
    "immunization": _cfg(
        exclude=(
            "id", "identifier", "basedOn", "statusReason", "administeredProduct",
            "lotNumber", "expirationDate", "supportingInformation",
            "primarySource", "informationSource", "performer", "note",
        ),
        refs=("patient", "encounter", "location"),
        defaults={"status": "completed"},
    ),
    # diagnosticreport.py:42-94
    "diagnosticreport": _cfg(
        exclude=("identifier",),
        refs=(
            "basedOn", "subject", "performer", "resultsInterpreter",
            "specimen", "result", "study", "composition",
        ),
        defaults={"status": "final"},
    ),
    # researchsubject.py:19-42
    "researchsubject": _cfg(
        exclude=("id", "identifier"),
        refs=("study", "subject", "consent"),
        defaults={"status": "active"},
    ),
    # specimen.py:24-57 (no defaults; nested container/collection wraps)
    "specimen": _cfg(
        exclude=("id", "identifier", "accessionIdentifier", "status", "note"),
        refs=(
            "subject", "parent", "request", "collection.collector",
            "collection.procedure", "container.device", "container.location",
        ),
    ),
    # location.py:15-38
    "location": _cfg(
        exclude=("id", "identifier", "status", "contact", "hoursOfOperation"),
        refs=("managingOrganization", "partOf", "endpoint"),
    ),
    # organization.py:19-42 (active=True default)
    "organization": _cfg(
        exclude=("id", "identifier", "active", "contact"),
        refs=("partOf", "endpoint", "qualification.issuer"),
        defaults={"active": True},
    ),
}


def expand_resource_batch(batch: pa.Table, resource: str) -> pa.Table:
    """Flat → nested for one catalogued resource: cleanup (vectorized
    reference-wrap / casts / truncations / defaults) then struct expansion —
    the engine form of ``cleanup()`` + ``expand_concepts``."""
    from fhirflat_ray.stages.flatten import unflatten_batch

    config = RESOURCE_CONFIGS[resource]
    return unflatten_batch(cleanup_flat_batch(batch, config), config)


def flatten_resource_batch(batch: pa.Table, resource: str) -> pa.Table:
    """Nested → flat for one catalogued resource (exclusions applied as
    attribute prefixes, like the reference nulling whole attributes before
    flattening — base.py:346-348)."""
    from fhirflat_ray.stages.flatten import flatten_batch

    return flatten_batch(batch, RESOURCE_CONFIGS[resource])
