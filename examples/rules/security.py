"""Example rules — the reference's @rule API on the Spark engine.

A reference deployment's rule modules port by swapping the import: the
decorator options (logs, datatypes, matchers, outputs, merge_by_keys,
merge_window_mins, req_subkeys, context, dynamic_outputs) keep their
semantics (shared/rule.py:32-80). Native-expression rules (expr=...) run
fully JVM-side; Python-bodied rules run as Arrow-batched predicates after
the engine's native pre-filters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamalert_spark.rules.registry import Rule, RuleRegistry


def build_rules(lookups=None) -> RuleRegistry:
    """The full example deployment's rule registry. ``lookups`` (a
    LookupTables) enables the in-rule lookup-table example family."""
    rules = RuleRegistry()

    rules.matcher(
        lambda rec: rec.get("detail-type") == "GuardDuty Finding",
        name="guard_duty",
        expr=lambda rec: rec["detail-type"] == "GuardDuty Finding",
    )

    # native-expression rule: stays in whole-stage codegen
    rules.add(Rule(
        name="guard_duty_all",
        expr=lambda rec: F.lit(True),
        matchers=["guard_duty"],
        logs=["cloudwatch:events"],
        outputs=["slack:security"],
        merge_by_keys=["account"],
        merge_window_mins=10,
        description="Any GuardDuty finding (rules/community/guardduty).",
    ))

    # Python-bodied rule with req_subkeys pre-check (runs only on rows that
    # pass the native isNotNull gate)
    @rules.rule(logs=["osquery:differential"],
                req_subkeys={"columns": ["path"]},
                outputs=["pagerduty:oncall"])
    def osquery_sensitive_path(record):
        """osquery file event under /etc or /root."""
        path = record["columns"].get("path") or ""
        return path.startswith(("/etc/", "/root/"))

    # OsqueryMatcher port (matchers/default.py:27-54): 'added' action and
    # a user login from the incident-response last-table pack, excluding
    # runlevel pseudo-users.
    _RUNLEVELS = {"", "LOGIN", "reboot", "shutdown", "runlevel"}
    _EVENT_TYPE_LOGIN = 7

    rules.matcher(
        lambda rec: rec.get("action") == "added",
        name="osquery_added",
        expr=lambda rec: rec["action"] == "added",
    )

    def _user_login(rec):
        try:
            return (
                rec["name"] == "pack_incident-response_last"
                and int(rec["columns"]["type"]) == _EVENT_TYPE_LOGIN
                and rec["columns"]["username"] not in _RUNLEVELS
            )
        except (KeyError, TypeError, ValueError):
            return False

    rules.matcher(
        _user_login,
        name="osquery_user_login",
        expr=lambda rec: (
            (rec["name"] == "pack_incident-response_last")
            & (rec["columns"]["type"].try_cast("int") == _EVENT_TYPE_LOGIN)
            & ~rec["columns"]["username"].isin(sorted(_RUNLEVELS))
        ),
    )

    # rules/community/osquery/ssh_login_activity.py:6-18 — body is True
    rules.add(Rule(
        name="ssh_login_activity",
        expr=lambda rec: F.lit(True),
        matchers=["osquery_added", "osquery_user_login"],
        logs=["osquery:differential"],
        outputs=["slack:security"],
        description="Detect ssh login activity based on the osquery last table.",
    ))

    # AWS Config rules ported from rules/community/cloudtrail/
    # cloudtrail_aws_config.py + matchers/default.py AwsConfigMatcher.
    # Free-form {} schema fields surface as map<string,string> whose nested
    # values are JSON text — Python-bodied rules re-parse them with
    # safe_json_loads (the documented porting pattern for dict-typed
    # fields); scalar booleans arrive as 'true'/'false' strings.
    rules.matcher(
        lambda rec: (rec.get("eventSource") == "config.amazonaws.com"
                     and rec.get("eventName") == "PutEvaluations"
                     and (rec.get("requestParameters") or {}).get("testMode") != "true"),
        name="is_config_compliance",
        expr=lambda rec: (
            (rec["eventSource"] == "config.amazonaws.com")
            & (rec["eventName"] == "PutEvaluations")
            & F.coalesce(rec["requestParameters"]["testMode"] != "true", F.lit(True))
        ),
    )

    @rules.rule(logs=["cloudtrail:events"], matchers=["is_config_compliance"],
                outputs=["slack:compliance"])
    def config_compliance(record):
        """Alert on AWS Config compliance change of NON_COMPLIANT
        (cloudtrail_aws_config.py:12-34)."""
        from streamalert_spark.rules.helpers import safe_json_loads

        evaluations = safe_json_loads(
            (record.get("requestParameters") or {}).get("evaluations") or "[]")
        return any(e.get("complianceType") == "NON_COMPLIANT"
                   for e in (evaluations or []))

    rules.matcher(
        lambda rec: (rec.get("eventName") == "StartAutomationExecution"
                     and rec.get("eventSource") == "ssm.amazonaws.com"
                     and rec.get("sourceIPAddress") == "config.amazonaws.com"),
        name="is_auto_remediation",
        expr=lambda rec: (
            (rec["eventName"] == "StartAutomationExecution")
            & (rec["eventSource"] == "ssm.amazonaws.com")
            & (rec["sourceIPAddress"] == "config.amazonaws.com")
        ),
    )

    # rule body is `return True` (cloudtrail_aws_config.py:37-47)
    rules.add(Rule(
        name="config_auto_remediation",
        expr=lambda rec: F.lit(True),
        matchers=["is_auto_remediation"],
        logs=["cloudtrail:events"],
        outputs=["slack:compliance"],
        description="AWS Config auto-remediation run.",
    ))

    # denied flow to a sensitive port
    rules.add(Rule(
        name="flow_denied_ssh",
        expr=lambda rec: (rec["action"] == "REJECT") & (rec["dstport"] == 22),
        logs=["cloudwatch:flow_logs"],
        outputs=["slack:network"],
        description="Rejected inbound SSH flow.",
    ))

    from examples.rules.cloudwatch_events import register as register_cloudwatch_events
    from examples.rules.github import register as register_github
    from examples.rules.mitre import register as register_mitre
    from examples.rules.saas import register as register_saas
    register_cloudwatch_events(rules)
    register_github(rules)
    register_saas(rules, lookups=lookups)
    register_mitre(rules)
    return rules
