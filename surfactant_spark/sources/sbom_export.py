"""High-fidelity SPDX / CycloneDX exporters (S9/S10), DataFrame-native.

Re-expresses the reference's writer semantics set-at-a-time over a
SOFTWARE-shaped table (uuid, name, version, vendor[], description,
fileName[], installPath[], containerPath[], sha1/sha256/md5) + a triple
table (subj_uuid, pred, obj_uuid):

- **Packages vs Files split** (`output/spdx_writer.py:69-91`): an entry
  becomes SPDX Package(s) — one per fileName — iff it has an outgoing
  Contains edge; otherwise SPDX File(s) — one per containerPath with a
  parent component, else one per fileName.
- **uuid -> spdx-id fan-out** (`spdx_writer.py:112-117`): relationships
  expand over the cross product of the subject's and object's element
  ids (a uuid maps to many elements).
- **Container-edge dedup** (`spdx_writer.py:119-125`,
  `cyclonedx_writer.py:66-73`): a file element materialized from
  container A's containerPath only receives the Contains edge from A.
- **Relationship-type mapping** (`spdx_writer.py:126-136`): upper-cased;
  types outside the SPDX vocabulary become OTHER with a `Type: X`
  comment.
- **DESCRIBES** rows for every package, or a single NOASSERTION row when
  there are no packages (`spdx_writer.py:93-108`).
- **Package verification codes** (`spdx_writer.py:144-161`): sha1 of the
  concatenated sorted sha1s of the files each package Contains.
- CycloneDX: container components per fileName keyed by uuid,
  file components per containerPath, Dependency rows with set
  semantics keyed by raw uuids (`cyclonedx_writer.py:40-85`).

Deliberate divergences (documented, resume-idempotency driven):
element id strings use a deterministic sha-derived suffix instead of
the reference's `generate_random_idstring` (`spdx_writer.py:422-431`);
the CycloneDX per-uuid primary parent is the min parent uuid instead of
dict-insertion last-wins (`cyclonedx_writer.py:59`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SPDX_DOC_ID = "SPDXRef-DOCUMENT"

# SPDX 2.3 relationship vocabulary (subset actually reachable from the
# engine's predicates plus the common ones merge can configure)
SPDX_KNOWN_TYPES = frozenset(
    [
        "DESCRIBES", "DESCRIBED_BY", "CONTAINS", "CONTAINED_BY",
        "DEPENDS_ON", "DEPENDENCY_OF", "GENERATES", "GENERATED_FROM",
        "ANCESTOR_OF", "DESCENDANT_OF", "VARIANT_OF", "DISTRIBUTION_ARTIFACT",
        "PATCH_FOR", "PATCH_APPLIED", "COPY_OF", "FILE_ADDED", "FILE_DELETED",
        "FILE_MODIFIED", "EXPANDED_FROM_ARCHIVE", "DYNAMIC_LINK", "STATIC_LINK",
        "DATA_FILE_OF", "TEST_CASE_OF", "BUILD_TOOL_OF", "DEV_TOOL_OF",
        "TEST_OF", "TEST_TOOL_OF", "DOCUMENTATION_OF", "OPTIONAL_COMPONENT_OF",
        "METAFILE_OF", "PACKAGE_OF", "AMENDS", "PREREQUISITE_FOR",
        "HAS_PREREQUISITE", "REQUIREMENT_DESCRIPTION_FOR", "SPECIFICATION_FOR",
        "OTHER",
    ]
)


def _sanitize(c: F.Column) -> F.Column:
    return F.regexp_replace(c, "[^A-Za-z0-9.\\-]", "")


def _id_suffix(*cols: F.Column) -> F.Column:
    """Deterministic 8-hex uniquifier (vs the reference's random 5-char
    string, `spdx_writer.py:422-431`) so retries emit identical ids."""
    return F.substring(F.sha2(F.concat_ws("\x1f", *cols), 256), 1, 8)


def _opt(df: DataFrame, col: str, default=None):
    if col in df.columns:
        return F.col(col)
    return F.lit(default)


def _container_uuids(edges: DataFrame) -> DataFrame:
    return (
        edges.where(F.col("pred") == "Contains")
        .select(F.col("subj_uuid").alias("uuid"))
        .dropDuplicates()
    )


def spdx_export(
    software: DataFrame, edges: DataFrame, systems: DataFrame = None
) -> tuple:
    """-> (packages, files, relationships) DataFrames.

    packages: (spdx_id, uuid, name, version, file_name, supplier,
               description, sha1, sha256, md5, verification_code)
    files:    (spdx_id, uuid, parent_uuid, file_path, sha1, sha256, md5)
    relationships: (spdx_element_id, relationship_type,
                    related_spdx_element, comment)
    """
    containers = _container_uuids(edges)
    is_pkg = software.join(containers, "uuid", "left_semi")
    is_file = software.join(containers, "uuid", "left_anti")

    pkg_sw = (
        is_pkg.select(
            "uuid",
            _opt(is_pkg, "name").alias("name"),
            _opt(is_pkg, "version").alias("version"),
            _opt(is_pkg, "vendor").alias("vendor"),
            _opt(is_pkg, "description").alias("description"),
            _opt(is_pkg, "sha1").alias("sha1"),
            _opt(is_pkg, "sha256").alias("sha256"),
            _opt(is_pkg, "md5").alias("md5"),
            F.explode("fileName").alias("file_name"),
        )
        .select(
            F.concat(
                F.lit("SPDXRef-"),
                F.concat_ws(
                    "-",
                    _sanitize(F.coalesce(F.col("name"), F.col("file_name"))),
                    _sanitize(F.coalesce(F.col("version"), F.lit(""))),
                    _sanitize(F.col("file_name")),
                    _id_suffix(F.col("uuid"), F.col("file_name")),
                ),
            ).alias("spdx_id"),
            "uuid",
            F.coalesce(F.col("name"), F.col("file_name")).alias("name"),
            "version",
            "file_name",
            F.try_element_at(F.coalesce("vendor", F.array()), F.lit(1)).alias("supplier"),
            "description",
            "sha1",
            "sha256",
            "md5",
        )
    )
    packages = pkg_sw
    if systems is not None:
        sys_pkgs = systems.select(
            F.concat(
                F.lit("SPDXRef-"),
                F.concat_ws(
                    "-", _sanitize(F.coalesce(_opt(systems, "name"), F.lit("system"))),
                    _id_suffix(F.col("uuid")),
                ),
            ).alias("spdx_id"),
            "uuid",
            _opt(systems, "name").alias("name"),
            F.lit(None).cast("string").alias("version"),
            F.lit(None).cast("string").alias("file_name"),
            F.lit(None).cast("string").alias("supplier"),
            F.lit(None).cast("string").alias("description"),
            F.lit(None).cast("string").alias("sha1"),
            F.lit(None).cast("string").alias("sha256"),
            F.lit(None).cast("string").alias("md5"),
        )
        packages = sys_pkgs.unionByName(packages)

    fbase = is_file.select(
        "uuid",
        _opt(is_file, "name").alias("name"),
        _opt(is_file, "version").alias("version"),
        _opt(is_file, "sha1").alias("sha1"),
        _opt(is_file, "sha256").alias("sha256"),
        _opt(is_file, "md5").alias("md5"),
        _opt(is_file, "fileName").alias("fileName"),
        _opt(is_file, "containerPath").alias("containerPath"),
    )
    with_cpath = (
        fbase.where(F.size(F.coalesce("containerPath", F.array())) > 0)
        .select("*", F.explode("containerPath").alias("cpath"))
        .where(F.size(F.split("cpath", "/")) > 1)
        .select(
            "uuid", "name", "version", "sha1", "sha256", "md5",
            F.element_at(F.split("cpath", "/"), 1).alias("parent_uuid"),
            F.concat(
                F.lit("./"),
                F.array_join(F.slice(F.split("cpath", "/"), 2, 100000), "/"),
            ).alias("file_path"),
        )
    )
    no_cpath = (
        fbase.where(F.size(F.coalesce("containerPath", F.array())) == 0)
        .select("*", F.explode("fileName").alias("fname"))
        .select(
            "uuid", "name", "version", "sha1", "sha256", "md5",
            F.lit(None).cast("string").alias("parent_uuid"),
            F.concat(F.lit("./"), F.col("fname")).alias("file_path"),
        )
    )
    files = with_cpath.unionByName(no_cpath).select(
        F.concat(
            F.lit("SPDXRef-"),
            F.concat_ws(
                "-",
                _sanitize(F.element_at(F.split("file_path", "/"), -1)),
                _sanitize(F.coalesce(F.col("version"), F.lit(""))),
                _sanitize(F.coalesce(F.col("name"), F.lit(""))),
                # parent in the suffix: one element per (container, path),
                # like the reference's per-containerPath unique ids
                _id_suffix(
                    F.col("uuid"),
                    F.coalesce(F.col("parent_uuid"), F.lit("")),
                    F.col("file_path"),
                ),
            ),
        ).alias("spdx_id"),
        "uuid",
        "parent_uuid",
        "file_path",
        "sha1",
        "sha256",
        "md5",
    )

    uuid_map = packages.select("uuid", "spdx_id").unionByName(
        files.select("uuid", "spdx_id")
    )

    describes = packages.select(
        F.lit(SPDX_DOC_ID).alias("spdx_element_id"),
        F.lit("DESCRIBES").alias("relationship_type"),
        F.col("spdx_id").alias("related_spdx_element"),
        F.lit(None).cast("string").alias("comment"),
    )

    rel_type = F.upper(F.col("pred"))
    file_parents = files.where(F.col("parent_uuid").isNotNull()).select(
        F.col("spdx_id").alias("related_spdx_element"),
        F.col("parent_uuid").alias("_file_parent"),
    )
    rels = (
        edges.join(
            uuid_map.select(F.col("uuid").alias("subj_uuid"), F.col("spdx_id").alias("spdx_element_id")),
            "subj_uuid",
        )
        .join(
            uuid_map.select(F.col("uuid").alias("obj_uuid"), F.col("spdx_id").alias("related_spdx_element")),
            "obj_uuid",
        )
        .join(file_parents, "related_spdx_element", "left")
        .where(
            (rel_type != "CONTAINS")
            | F.col("_file_parent").isNull()
            | (F.col("_file_parent") == F.col("subj_uuid"))
        )
        .select(
            "spdx_element_id",
            F.when(rel_type.isin(list(SPDX_KNOWN_TYPES)), rel_type)
            .otherwise(F.lit("OTHER"))
            .alias("relationship_type"),
            "related_spdx_element",
            F.when(
                ~rel_type.isin(list(SPDX_KNOWN_TYPES)),
                F.concat(F.lit("Type: "), rel_type),
            ).alias("comment"),
        )
        .dropDuplicates()
    )
    relationships = describes.unionByName(rels)

    # package verification codes: sha1 of concatenated sorted file sha1s
    contained = (
        relationships.where(F.col("relationship_type") == "CONTAINS")
        .select(
            F.col("spdx_element_id").alias("spdx_id"),
            F.col("related_spdx_element").alias("file_id"),
        )
        .join(
            files.select(F.col("spdx_id").alias("file_id"), F.col("sha1").alias("fsha1")),
            "file_id",
        )
        .groupBy("spdx_id")
        .agg(
            F.sha1(
                F.encode(
                    F.concat_ws("", F.array_sort(F.collect_list("fsha1"))), "UTF-8"
                )
            ).alias("verification_code")
        )
    )
    packages = packages.join(contained, "spdx_id", "left")
    return packages, files, relationships


def cyclonedx_export(
    software: DataFrame, edges: DataFrame, systems: DataFrame = None
) -> tuple:
    """-> (components, dependencies).

    components: (bom_ref, type, name, version, supplier, description,
                 sha1, sha256, md5, file_path)
    dependencies: (ref, dependsOn) with set semantics.
    """
    containers = _container_uuids(edges)
    is_cont = software.join(containers, "uuid", "left_semi")
    is_file = software.join(containers, "uuid", "left_anti")

    cont_comps = is_cont.select(
        F.col("uuid").alias("bom_ref"),
        F.lit("container").alias("type"),
        F.explode("fileName").alias("_fname"),
        _opt(is_cont, "name").alias("_name"),
        _opt(is_cont, "version").alias("version"),
        F.try_element_at(F.coalesce(_opt(is_cont, "vendor"), F.array()), F.lit(1)).alias("supplier"),
        _opt(is_cont, "description").alias("description"),
        _opt(is_cont, "sha1").alias("sha1"),
        _opt(is_cont, "sha256").alias("sha256"),
        _opt(is_cont, "md5").alias("md5"),
    ).select(
        "bom_ref", "type",
        F.coalesce("_name", "_fname").alias("name"),
        "version", "supplier", "description", "sha1", "sha256", "md5",
        F.lit(None).cast("string").alias("file_path"),
    )

    fbase = is_file.select(
        "uuid",
        _opt(is_file, "name").alias("name"),
        _opt(is_file, "version").alias("version"),
        _opt(is_file, "sha1").alias("sha1"),
        _opt(is_file, "sha256").alias("sha256"),
        _opt(is_file, "md5").alias("md5"),
        _opt(is_file, "fileName").alias("fileName"),
        _opt(is_file, "containerPath").alias("containerPath"),
    )
    with_cpath = (
        fbase.where(F.size(F.coalesce("containerPath", F.array())) > 0)
        .select("*", F.explode("containerPath").alias("cpath"))
        .where(F.size(F.split("cpath", "/")) > 1)
        .select(
            "uuid", "name", "version", "sha1", "sha256", "md5",
            F.element_at(F.split("cpath", "/"), 1).alias("parent_uuid"),
            F.array_join(F.slice(F.split("cpath", "/"), 2, 100000), "/").alias("file_path"),
        )
    )
    no_cpath = (
        fbase.where(F.size(F.coalesce("containerPath", F.array())) == 0)
        .select("*", F.explode("fileName").alias("fname"))
        .select(
            "uuid", "name", "version", "sha1", "sha256", "md5",
            F.lit(None).cast("string").alias("parent_uuid"),
            F.col("fname").alias("file_path"),
        )
    )
    file_rows = with_cpath.unionByName(no_cpath)
    file_comps = file_rows.select(
        F.col("uuid").alias("bom_ref"),
        F.lit("file").alias("type"),
        F.coalesce("name", F.element_at(F.split("file_path", "/"), -1)).alias("name"),
        "version",
        F.lit(None).cast("string").alias("supplier"),
        F.lit(None).cast("string").alias("description"),
        "sha1", "sha256", "md5", "file_path",
    )
    # identical rows collapse like the reference's Bom.components set
    components = cont_comps.unionByName(file_comps).dropDuplicates()
    if systems is not None:
        sys_comps = systems.select(
            F.col("uuid").alias("bom_ref"),
            F.lit("system").alias("type"),
            _opt(systems, "name").alias("name"),
            F.lit(None).cast("string").alias("version"),
            F.lit(None).cast("string").alias("supplier"),
            F.lit(None).cast("string").alias("description"),
            F.lit(None).cast("string").alias("sha1"),
            F.lit(None).cast("string").alias("sha256"),
            F.lit(None).cast("string").alias("md5"),
            F.lit(None).cast("string").alias("file_path"),
        )
        components = sys_comps.unionByName(components)

    # primary parent per file uuid (deterministic min; the reference's
    # dict is insertion-order last-wins, meaningless distributed)
    primary_parent = (
        file_rows.where(F.col("parent_uuid").isNotNull())
        .groupBy("uuid")
        .agg(F.min("parent_uuid").alias("_parent"))
        .select(F.col("uuid").alias("obj_uuid"), "_parent")
    )
    dependencies = (
        edges.join(primary_parent, "obj_uuid", "left")
        .where(
            (F.upper(F.col("pred")) != "CONTAINS")
            | F.col("_parent").isNull()
            | (F.col("_parent") == F.col("subj_uuid"))
        )
        .select(F.col("subj_uuid").alias("ref"), F.col("obj_uuid").alias("dependsOn"))
        .dropDuplicates()
    )
    return components, dependencies


def spdx_to_edges(relationships: DataFrame, packages: DataFrame, files: DataFrame) -> DataFrame:
    """Inverse projection (round-trip reader): SPDX relationships back to
    (subj_uuid, pred, obj_uuid) triples. OTHER rows recover their
    original predicate from the `Type: X` comment; DESCRIBES rows (the
    document's own assertions) are dropped."""
    id_map = packages.select("spdx_id", "uuid").unionByName(files.select("spdx_id", "uuid"))
    return (
        relationships.where(F.col("spdx_element_id") != SPDX_DOC_ID)
        .join(
            id_map.select(F.col("spdx_id").alias("spdx_element_id"), F.col("uuid").alias("subj_uuid")),
            "spdx_element_id",
        )
        .join(
            id_map.select(F.col("spdx_id").alias("related_spdx_element"), F.col("uuid").alias("obj_uuid")),
            "related_spdx_element",
        )
        .select(
            "subj_uuid",
            F.when(
                F.col("relationship_type") == "OTHER",
                F.regexp_replace(F.col("comment"), "^Type: ", ""),
            )
            .otherwise(F.initcap(F.lower(F.col("relationship_type"))))
            .alias("pred"),
            "obj_uuid",
        )
        .dropDuplicates()
    )
