"""SaaS / endpoint community rule families on the Spark engine.

Ports rules/community/{duo_administrator,duo_authentication,packetbeat,
binaryalert,fleet,onelogin,trendmicro}. Simple field predicates compile to
native Column expressions; bodies that re-parse JSON-string fields
(duo_administrator's ``description``) run as Arrow-batched Python
predicates behind a native ``action == 'bypass_create'`` matcher gate so
the slow path sees only candidate rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamalert_spark.rules.helpers import safe_json_loads
from streamalert_spark.rules.registry import Rule, RuleRegistry

_DNS_BLACKLIST = ["evil.com."]          # packetbeat_blacklisted_domain.py:5-7
_IP_BLACKLIST = ["222.173.190.239"]     # packetbeat_blacklisted_ip.py:6-8


def register(rules: RuleRegistry, lookups=None) -> None:
    # -- duo_administrator (3 rules over the bypass_create description JSON) --
    # description is a JSON string field (schema type "string"); the
    # reference re-parses it with safe_json_loads per rule
    rules.matcher(
        lambda rec: rec.get("action") == "bypass_create",
        name="duo_bypass_create",
        expr=lambda rec: rec["action"] == "bypass_create",
    )

    @rules.rule(logs=["duo:administrator"], matchers=["duo_bypass_create"],
                outputs=["pagerduty:duo"])
    def duo_bypass_code_create_non_auto_generated(record):
        """duo_bypass_code_create_non_auto_generated.py:8-17 — a bypass
        code crafted by hand rather than auto-generated."""
        return safe_json_loads(record.get("description") or "").get(
            "auto_generated") is False

    @rules.rule(logs=["duo:administrator"], matchers=["duo_bypass_create"],
                outputs=["pagerduty:duo"])
    def duo_bypass_code_create_non_expiring(record):
        """duo_bypass_code_create_non_expiring.py:8-17 — valid_secs null
        means the code never expires. Like the reference's
        ``.get('valid_secs') is None``, this also fires when the key is
        absent or the description is unparseable JSON; a missing
        description key raises there (mapped to False), mirrored here."""
        if "description" not in record:
            return False
        return safe_json_loads(record["description"]).get("valid_secs") is None

    @rules.rule(logs=["duo:administrator"], matchers=["duo_bypass_create"],
                outputs=["pagerduty:duo"])
    def duo_bypass_code_create_unlimited_use(record):
        """duo_bypass_code_create_unlimited_use.py:8-17 — remaining_uses
        null means unlimited; fires on key-absent / unparseable
        description too (reference ``.get(...) is None`` semantics)."""
        if "description" not in record:
            return False
        return safe_json_loads(record["description"]).get(
            "remaining_uses") is None

    # -- duo_authentication (2 native + the lookup-table example) -------------
    rules.add(Rule(
        name="duo_anonymous_ip_failure",
        expr=lambda rec: (rec["result"] == "FAILURE")
        & (rec["reason"] == "Anonymous IP"),
        logs=["duo:authentication"],
        outputs=["pagerduty:duo"],
        description="duo_anonymous_ip_failure.py:6-14 — failure flagged as "
                    "coming from an anonymous network.",
    ))
    rules.add(Rule(
        name="duo_fraud",
        expr=lambda rec: rec["result"] == "FRAUD",
        logs=["duo:authentication"],
        outputs=["pagerduty:duo"],
        description="duo_fraud.py:6-14 — user-reported fraud.",
    ))

    if lookups is not None:
        # duo_lookup_tables_example.py:7-21 — in-rule LookupTables.get;
        # the view carries broadcast handles only (executor-safe), and
        # sees tables registered later (golden-event fixtures)
        view = lookups.view()

        @rules.rule(logs=["duo:authentication"], outputs=["slack:duo"])
        def duo_lookup_tables_example(record):
            """Blacklisted browser per the dynamo-backed lookup table."""
            blacklisted = view.get(
                "dynamo-backed-table", "duo_blacklisted_browsers", [])
            browser = (record.get("access_device") or {}).get("browser")
            return browser in set(blacklisted)

    # -- packetbeat (3 native rules over free-form dns/dest maps) -------------
    # dns is a {} field -> map<string,string>; dns.question is nested JSON
    # text, so the question name check re-parses it Python-side in the
    # reference; here get_json_object keeps it JVM-side.
    rules.add(Rule(
        name="packetbeat_blacklisted_domain",
        expr=lambda rec: F.get_json_object(
            rec["dns"]["question"], "$.name").isin(_DNS_BLACKLIST),
        logs=["packetbeat:dns"],
        outputs=["slack:network"],
        description="packetbeat_blacklisted_domain.py:8-16 — DNS lookup "
                    "for a blacklisted (CnC) domain.",
    ))
    rules.add(Rule(
        name="packetbeat_dns_lookup",
        expr=lambda rec: F.get_json_object(
            rec["dns"]["question"], "$.name").endswith(".evil.com."),
        logs=["packetbeat:dns"],
        outputs=["slack:network"],
        description="packetbeat_dns_lookup.py:6-14 — DNS lookup under a "
                    "blacklisted zone.",
    ))
    # IPv4Address(rec['source']['ip']) in the reference raises on a
    # missing/invalid/IPv6 source address (engine maps to False) — the
    # native twin is a strict dotted-quad regex gate (no leading zeros,
    # octets 0-255, matching what ipaddress.IPv4Address accepts).
    _ipv4_octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    _ipv4_regex = r"^({o}\.){{3}}{o}$".format(o=_ipv4_octet)
    rules.add(Rule(
        name="packetbeat_blacklisted_ip",
        expr=lambda rec: rec["source"]["ip"].isNotNull()
        & rec["source"]["ip"].rlike(_ipv4_regex)
        & rec["dest"]["ip"].isin(_IP_BLACKLIST),
        logs=["packetbeat:flow"],
        outputs=["slack:network"],
        description="packetbeat_blacklisted_ip.py:9-18 — network "
                    "connection to a blacklisted IP (source IP must be "
                    "valid IPv4, per the reference's IPv4Address gate).",
    ))

    # -- binaryalert ----------------------------------------------------------
    rules.add(Rule(
        name="binaryalert_yara_match",
        expr=lambda rec: rec["NumMatchedRules"] > 0,
        logs=["binaryalert"],
        outputs=["pagerduty:binaryalert"],
        description="binaryalert_yara_match.py:6-13 — BinaryAlert found a "
                    "binary matching a YARA rule.",
    ))

    # -- fleet (shipped @disable'd — ported the same way) ---------------------
    rules.add(Rule(
        name="fleet_bad_action",
        expr=lambda rec: F.coalesce(
            rec["columns"]["bad_action"], F.lit("1")) == "1",
        logs=["fleet:results"],
        outputs=["slack:fleet"],
        disabled=True,
        description="fleet_bad_action.py:8-24 — shipped behind @disable.",
    ))

    # -- onelogin -------------------------------------------------------------
    rules.add(Rule(
        name="onelogin_events_assumed_role",
        expr=lambda rec: rec["event_type_id"] == 3,
        logs=["onelogin:events"],
        outputs=["slack:onelogin"],
        description="onelogin_events_assumed_role.py:6-15 — a user assumed "
                    "the role of someone else (event type 3).",
    ))

    # onelogin_events_threat_intel_example.py:14-28 — shipped @disable'd;
    # reads the engine's IOC annotation (streamalert_ioc map column,
    # threat_intel.py:105-132) exactly like the reference's IOC_KEY check
    rules.add(Rule(
        name="onelogin_events_threat_intel_example",
        expr=lambda rec: F.map_contains_key(F.col("streamalert_ioc"), "ip"),
        logs=["onelogin:events"],
        outputs=["slack:onelogin"],
        disabled=True,
        description="OneLogin activity from a known-malicious IP "
                    "(threat intel; requires a ThreatIntel-wired pipeline).",
    ))

    # -- trendmicro -----------------------------------------------------------
    rules.add(Rule(
        name="trendmicro_malware_event",
        expr=lambda rec: F.lit(True),
        logs=["trendmicro:malwareevent"],
        outputs=["pagerduty:trendmicro"],
        description="trendmicro_malware_event.py:6-16 — any malware event "
                    "(body is `return True`; classification is the filter).",
    ))
