"""Threat-intel IOC detection as a broadcast join.

Reference behavior (streamalert/rules_engine/threat_intel.py): extract
candidate IOC values from each record's normalization map, translate the
normalized key to an IOC type via conf/threat_intel.json's
normalized_ioc_types (threat_intel.py:76-103,293-324), drop values inside
excluded CIDRs (threat_intel.py:272-291,326-337), batch-probe a DynamoDB
table 100 keys at a time (threat_intel.py:45,153-166,168-229), and annotate
matched records with a 'streamalert:ioc' map {ioc_type: [values]}
(threat_intel.py:105-132).

Spark mapping (SURVEY.md §2.3/§2.7): explode the candidates, broadcast
left-semi/inner join against the ioc table on ioc_value, re-aggregate per
record into the ioc map. The 100-key batching disappears — the join IS the
batch. CIDR exclusion is a native bitmask comparison on the IPv4 integer
(no UDF): ip & mask == net & mask.

Scale: ioc tables are usually MBs -> broadcast, but the reference's feed
downloader paginates an UNBOUNDED ThreatStream feed (tens of millions of
IOCs are real), so the hint is size-gated (``gated_broadcast``): under the
budget the join broadcasts; over it the un-hinted equi-join falls to AQE,
which shuffles both sides on ioc_value — the only safe plan for a huge
feed. Candidate explosion is bounded by normalization fan-out; the groupBy
re-aggregation shuffles only matched records (a tiny fraction), keyed by
record id.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamalert_spark.ops.hints import gated_broadcast


def ipv4_to_long(col: Column) -> Column:
    """Dotted-quad -> int64, null for non-IPv4 strings. Pure expressions."""
    parts = F.split(col, r"\.")
    is_ip = col.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    as_long = (
        parts.getItem(0).cast("bigint") * F.lit(16777216)
        + parts.getItem(1).cast("bigint") * F.lit(65536)
        + parts.getItem(2).cast("bigint") * F.lit(256)
        + parts.getItem(3).cast("bigint")
    )
    octets_ok = (
        (parts.getItem(0).cast("bigint") <= 255)
        & (parts.getItem(1).cast("bigint") <= 255)
        & (parts.getItem(2).cast("bigint") <= 255)
        & (parts.getItem(3).cast("bigint") <= 255)
    )
    return F.when(is_ip & octets_ok, as_long)


def in_any_cidr(ip_long: Column, cidrs: list[str]) -> Column:
    """Native CIDR containment for a static exclusion list
    (threat_intel.py:287-290, shared/utils.py:32-54)."""
    conds = []
    for cidr in cidrs:
        net = ipaddress.ip_network(cidr)
        lo = int(net.network_address)
        hi = int(net.broadcast_address)
        conds.append(ip_long.between(lo, hi))
    if not conds:
        return F.lit(False)
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


class ThreatIntel:
    def __init__(
        self,
        ioc_df: DataFrame,
        normalized_ioc_types: dict[str, list[str]],
        excluded_cidrs: list[str] | None = None,
    ):
        """ioc_df: columns (ioc_value string, sub_type string).
        normalized_ioc_types: {ioc_type: [normalized type names]} — the
        conf/threat_intel.json mapping."""
        self.ioc_df = ioc_df
        self.normalized_ioc_types = normalized_ioc_types
        self.excluded_cidrs = excluded_cidrs or []

    def _candidates(self, df: DataFrame, id_col: str) -> DataFrame:
        """Explode (record_id, ioc_type, value) candidates from the
        normalization map (threat_intel.py:293-324)."""
        norm = F.col("streamalert_normalization")
        frames = []
        for ioc_type, norm_types in self.normalized_ioc_types.items():
            for nt in norm_types:
                entries = norm[nt]
                values = F.flatten(F.transform(entries, lambda e: e["values"]))
                frames.append(
                    df.select(
                        F.col(id_col).alias("__record_id"),
                        F.lit(ioc_type).alias("ioc_type"),
                        F.explode(F.coalesce(values, F.array())).alias("value"),
                    )
                )
        if not frames:
            raise ValueError("no normalized_ioc_types configured")
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        if self.excluded_cidrs:
            ip_long = ipv4_to_long(F.col("value"))
            out = out.filter(ip_long.isNull() | ~in_any_cidr(ip_long, self.excluded_cidrs))
        return out

    def hits(self, df: DataFrame, id_col: str = "streamalert_record_id") -> DataFrame:
        """Flat (streamalert_record_id, ioc_type, value, sub_type) hit rows —
        the broadcast join replacing the reference's DynamoDB batch probe."""
        cands = self._candidates(df, id_col)
        return cands.join(
            gated_broadcast(self.ioc_df),
            cands["value"] == self.ioc_df["ioc_value"],
            "inner",
        ).select(
            F.col("__record_id").alias("streamalert_record_id"),
            "ioc_type",
            "value",
            "sub_type",
        ).distinct()

    def matches(self, df: DataFrame, id_col: str = "streamalert_record_id") -> DataFrame:
        """(record_id, ioc map) for records with at least one IOC hit
        (the 'streamalert:ioc' annotation shape, threat_intel.py:105-132)."""
        hits = self.hits(df, id_col).withColumnRenamed("streamalert_record_id", "__record_id")
        return (
            hits.groupBy("__record_id", "ioc_type")
            .agg(F.array_distinct(F.collect_list("value")).alias("values"))
            .groupBy("__record_id")
            .agg(F.map_from_entries(F.collect_list(F.struct("ioc_type", "values"))).alias("streamalert_ioc"))
        )

    def annotate(self, df: DataFrame, id_col: str = "streamalert_record_id") -> DataFrame:
        """Attach 'streamalert_ioc' to matched records (left join keeps
        non-matched records with a null map — threat_intel.py:105-132)."""
        m = self.matches(df, id_col)
        return df.join(m, df[id_col] == m["__record_id"], "left").drop("__record_id")
