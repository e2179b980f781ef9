"""fhirflat_ray — a Ray-Data-native per-column lightweight-compression engine.

Re-expresses the data-processing capabilities of the reference
(globaldothealth/fhirflat: typed per-column transforms, lossless round-trip
as the correctness oracle, valid/error row routing, per-file checksum and
lineage metadata, dictionary-style column condensing — see
/root/reference/fhirflat/{fhir2flat.py,flat2fhir.py,ingest.py}) as idiomatic
Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches`` over zero-copy
Arrow batches, actor pools for stateful encode/decode stages, explicit
partitioning for skew, and per-partition lineage for resume.

Nothing here calls ``ray.init()``/``ray.shutdown()`` — sessions are owned by
the caller (driver, bench.py, CLI entry points, or the pytest fixture).
"""

from fhirflat_ray.schema import TRANSCRIPT_SCHEMA

__version__ = "0.1.0"

__all__ = ["TRANSCRIPT_SCHEMA", "__version__"]
