from streamalert_spark.enrich.lookup_tables import LookupTables
from streamalert_spark.enrich.threat_intel import ThreatIntel

__all__ = ["LookupTables", "ThreatIntel"]
