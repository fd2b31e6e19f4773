"""The github (GHE audit log) community rule family on the Spark engine.

Ports rules/community/github/*.py (9 rules, all routed ``ghe:general``).
The GHE audit record arrives embedded in a syslog-shaped ``message``
envelope field; the schema's ``json_regex_key`` configuration extracts the
JSON blob (conf/schemas/ghe.json), so rule bodies see the flat audit
record. Every rule here is a pure equality / prefix / map-value check —
all native Column expressions, fully inside whole-stage codegen.

Free-form ``data`` ({} schema field) surfaces as map<string,string> with
scalar JSON values as bare strings: the reference's
``rec['data'].get('authorized_actors_only') is True`` becomes
``rec["data"]["authorized_actors_only"] == "true"`` and enforcement-level
``== 0`` becomes ``== "0"``.
"""

from __future__ import annotations

from streamalert_spark.rules.registry import Rule, RuleRegistry

# action-equality rules: (rule name, audit action, reference file)
_ACTION_RULES = [
    ("github_disable_dismiss_stale_pull_request_approvals",
     "protected_branch.dismiss_stale_reviews",
     "github_disable_dismiss_stale_pull_request_approvals.py:6-18"),
    ("github_disable_protect_this_branch",
     "protected_branch.destroy",
     "github_disable_protect_this_branch.py:6-20"),
    ("github_disable_two_factor_requirement_org",
     "org.disable_two_factor_requirement",
     "github_disable_two_factor_requirement_org.py:6-17"),
    ("github_disable_two_factor_requirement_user",
     "two_factor_authentication.disabled",
     "github_disable_two_factor_requirement_user.py:6-14"),
    ("github_oauth_application_create",
     "oauth_application.create",
     "github_oauth_application_create.py:6-14"),
    ("github_site_admin_user_promotion",
     "user.promote",
     "github_site_admin_user_promotion.py:6-16"),
]


def register(rules: RuleRegistry) -> None:
    for name, action, ref in _ACTION_RULES:
        rules.add(Rule(
            name=name,
            expr=lambda rec, action=action: rec["action"] == action,
            logs=["ghe:general"],
            outputs=["slack:github"],
            description=f"rules/community/github/{ref}",
        ))

    # github_site_admin_action.py:6-16 — any staff.* tool usage
    rules.add(Rule(
        name="github_site_admin_action",
        expr=lambda rec: rec["action"].startswith("staff."),
        logs=["ghe:general"],
        outputs=["slack:github"],
        description="A Github site admin tool/action was used.",
    ))

    # github_disable_required_pull_request_reviews.py:6-23 — the actor
    # ignorelist is empty in the reference, so only the action and the
    # data.authorized_actors_only flag gate the alert
    rules.add(Rule(
        name="github_disable_required_pull_request_reviews",
        expr=lambda rec: (
            (rec["action"] == "protected_branch.dismissal_restricted_users_teams")
            & (rec["data"]["authorized_actors_only"] == "true")
        ),
        logs=["ghe:general"],
        outputs=["slack:github"],
        description="'Require pull request reviews before merging' was disabled.",
    ))

    # github_disable_required_status_checks.py:6-22 — enforcement level
    # 0 means the check was unchecked entirely
    rules.add(Rule(
        name="github_disable_required_status_checks",
        expr=lambda rec: (
            (rec["action"]
             == "protected_branch.update_required_status_checks_enforcement_level")
            & (rec["data"]["required_status_checks_enforcement_level"] == "0")
        ),
        logs=["ghe:general"],
        outputs=["slack:github"],
        description="'Required status checks' was disabled for a repo.",
    ))
