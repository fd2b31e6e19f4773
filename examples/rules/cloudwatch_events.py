"""The cloudwatch_events community rule family on the Spark engine.

Ports rules/community/cloudwatch_events/*.py (11 files, 12 rules). Two
sub-families by routing:

- ``cloudwatch:events`` rules read the CloudTrail record nested under the
  free-form ``detail`` field. ``detail`` surfaces as map<string,string>:
  scalar values are bare strings, nested structures are JSON text that
  rule bodies re-parse with ``safe_json_loads`` (the documented porting
  pattern for `{}` schema fields).
- ``cloudtrail:events`` rules read a flat record delivered via the
  ``Records[*]`` json_path; its `{}` fields (requestParameters,
  userIdentity, ...) surface the same way.

Cheap eventName/eventSource gates are emitted as native matcher
expressions so routing stays JVM-side; only the nested-JSON logic runs in
the vectorized Python stage.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from streamalert_spark.rules.helpers import (
    data_has_value_from_substring_list,
    safe_json_loads,
)
from streamalert_spark.rules.registry import Rule, RuleRegistry
from streamalert_spark.rules.utils import get_keys

# cloudtrail_critical_api_calls.py:4-52
_CRITICAL_EVENTS = {
    "DeleteFlowLogs",
    "DeleteSubnet", "DeleteVpc", "DeleteDBCluster", "DeleteCluster",
    "DeleteTrail", "PutEventSelectors", "UpdateTrail", "StopLogging",
    "DeleteDeliveryChannel", "StopConfigurationRecorder",
    "DeleteRule", "DisableRule",
    "DeleteDetector",
    "DeleteAccountPublicAccessBlock",
    "DisableEbsEncryptionByDefault",
}

_PUBLIC_ACCESS_BLOCK_ACTIONS = {
    "RestrictPublicBuckets", "BlockPublicPolicy",
    "BlockPublicAcls", "IgnorePublicAcls",
}

_AWS_ORG_EVENTS = {
    "AttachPolicy", "CreateOrganizationUnit", "CreatePolicy", "DeletePolicy",
    "DeleteOrganizationUnit", "DetachPolicy", "DisableAWSServiceAccess",
    "DisablePolicyType", "EnableAllFeatures", "EnableAWSServiceAccess",
    "EnablePolicyType", "LeaveOrganization", "MoveAccount",
    "RemoveAccountFromOrganization", "UpdatePolicy",
}

# cloudtrail_put_bucket_acl.py:4-7 / cloudtrail_put_object_acl_public.py:6-9
_DENIED_ACLS = {
    "http://acs.amazonaws.com/groups/global/AuthenticatedUsers",
    "http://acs.amazonaws.com/groups/global/AllUsers",
}

# s3 buckets that are expected to have public objects
_PUBLIC_BUCKETS = {"example-bucket-to-ignore"}

# cloudtrail_mfa_policy_abuse_attempt.py:5-17
_MFA_IAM_ACTIONS = {
    "CreateUser", "CreateAccessKey", "DetachUserPolicy", "DetachGroupPolicy",
    "RemoveUserFromGroup", "DeleteUserPolicy", "PutGroupPolicy",
    "PutUserPolicy",
}

_MFA_EVENT_NAMES = {"CreateVirtualMFADevice", "EnableMFADevice"}


def _policy_is_internet_accessible(policy: dict) -> bool:
    """Minimal stand-in for policyuniverse's is_internet_accessible
    (cloudtrail_public_resources.py:3,23-27 — the library is not in this
    environment): an Allow statement whose Principal is the wildcard and
    that carries no Condition."""
    if not isinstance(policy, dict):
        return False
    statements = policy.get("Statement") or []
    if isinstance(statements, dict):
        statements = [statements]
    for stmt in statements:
        if not isinstance(stmt, dict) or stmt.get("Effect") != "Allow":
            continue
        if stmt.get("Condition"):
            continue
        principal = stmt.get("Principal")
        values: list = []
        if isinstance(principal, str):
            values = [principal]
        elif isinstance(principal, dict):
            for v in principal.values():
                values.extend(v if isinstance(v, list) else [v])
        if "*" in values:
            return True
    return False


def register(rules: RuleRegistry) -> RuleRegistry:
    """Register the full family on an existing registry."""

    # ---- cloudwatch:events (CloudTrail under `detail`) -------------------

    @rules.rule(logs=["cloudwatch:events"],
                req_subkeys={"detail": ["userIdentity", "eventType"]},
                outputs=["slack:security"])
    def cloudtrail_root_account_usage(rec):
        """Root AWS credentials in use
        (cloudtrail_root_account_usage.py:5-24)."""
        identity = safe_json_loads(rec["detail"].get("userIdentity") or "{}")
        return (identity.get("type") == "Root"
                and identity.get("invokedBy") is None
                and rec["detail"].get("eventType") != "AwsServiceEvent")

    rules.matcher(
        lambda rec: (rec.get("detail") or {}).get("eventName") == "PutBucketAcl",
        name="is_put_bucket_acl",
        expr=lambda rec: rec["detail"]["eventName"] == "PutBucketAcl",
    )

    @rules.rule(logs=["cloudwatch:events"], matchers=["is_put_bucket_acl"],
                req_subkeys={"detail": ["requestParameters", "eventName"]},
                outputs=["slack:security"])
    def cloudtrail_put_bucket_acl(rec):
        """S3 bucket ACL grants access to AllUsers/AuthenticatedUsers
        (cloudtrail_put_bucket_acl.py:10-46)."""
        req_params = safe_json_loads(rec["detail"].get("requestParameters") or "null")
        if not req_params:  # requestParameters can be null
            return False
        access_control_policy = req_params.get("AccessControlPolicy")
        if not access_control_policy:
            return False
        grants = access_control_policy["AccessControlList"]["Grant"]
        bad = []
        for grant in grants:
            grantee = grant.get("Grantee", [])
            if "URI" in grantee:
                bad.append(grantee["URI"] in _DENIED_ACLS)
        return any(bad)

    rules.matcher(
        lambda rec: (rec.get("detail") or {}).get("eventName") == "PutObjectAcl",
        name="is_put_object_acl",
        expr=lambda rec: rec["detail"]["eventName"] == "PutObjectAcl",
    )

    @rules.rule(logs=["cloudwatch:events"], matchers=["is_put_object_acl"],
                req_subkeys={"detail": ["requestParameters"]},
                outputs=["slack:security"])
    def cloudtrail_put_object_acl_public(rec):
        """S3 object ACL grants public access — substring match because the
        URI can appear bare or as `uri=...`
        (cloudtrail_put_object_acl_public.py:16-37)."""
        request_params = safe_json_loads(rec["detail"].get("requestParameters") or "{}")
        return (data_has_value_from_substring_list(request_params, _DENIED_ACLS)
                and request_params.get("bucketName") not in _PUBLIC_BUCKETS)

    @rules.rule(logs=["cloudwatch:events"], matchers=["is_put_object_acl"],
                req_subkeys={"detail": ["eventName", "requestParameters",
                                        "sourceIPAddress"]},
                outputs=["slack:sample-channel", "pagerduty:sample-integration"],
                publishers={
                    "slack": ["add_record"],
                    "pagerduty": ["add_record", "populate_fields"],
                },
                context={"populate_fields": [
                    "userName", "sourceIPAddress", "eventTime", "eventName",
                    "eventSource", "bucketName",
                ]})
    def cloudtrail_put_object_acl_public_publisher_example(rec, _context=None):
        """Publisher-pipeline example variant pinned to one source address
        (cloudtrail_put_object_acl_public_publisher_example.py:18-62; the
        reference's slack/pagerduty layout publishers map to the ported
        generic library)."""
        if rec["detail"].get("sourceIPAddress") != "1.2.3.4":
            return False
        request_params = safe_json_loads(rec["detail"].get("requestParameters") or "{}")
        return data_has_value_from_substring_list(request_params, _DENIED_ACLS)

    rules.matcher(
        lambda rec: (rec.get("detail") or {}).get("eventName") == "CreateNetworkAclEntry",
        name="is_create_network_acl_entry",
        expr=lambda rec: rec["detail"]["eventName"] == "CreateNetworkAclEntry",
    )

    @rules.rule(logs=["cloudwatch:events"], matchers=["is_create_network_acl_entry"],
                req_subkeys={"detail": ["eventName", "requestParameters"]},
                outputs=["slack:network"])
    def cloudtrail_network_acl_ingress_anywhere(rec):
        """Network ACL allows ingress from anywhere
        (cloudtrail_network_acl_ingress_anywhere.py:5-25). `egress` is a
        JSON boolean, so it re-parses to a real bool."""
        req_params = safe_json_loads(rec["detail"].get("requestParameters") or "{}")
        return (req_params.get("cidrBlock") == "0.0.0.0/0"
                and req_params.get("ruleAction") == "allow"
                and req_params.get("egress") is False)

    rules.matcher(
        lambda rec: (rec.get("detail") or {}).get("eventName") == "AuthorizeSecurityGroupIngress",
        name="is_authorize_sg_ingress",
        expr=lambda rec: rec["detail"]["eventName"] == "AuthorizeSecurityGroupIngress",
    )

    @rules.rule(logs=["cloudwatch:events"], matchers=["is_authorize_sg_ingress"],
                req_subkeys={"detail": ["eventName", "requestParameters"]},
                outputs=["slack:network"])
    def cloudtrail_security_group_ingress_anywhere(rec):
        """Security group opens ingress to 0.0.0.0/0 or ::/0, IPv4+IPv6,
        found at any nesting depth
        (cloudtrail_security_group_ingress_anywhere.py:6-31)."""
        req_params = safe_json_loads(rec["detail"].get("requestParameters") or "{}")
        return ("0.0.0.0/0" in get_keys(req_params, "cidrIp")
                or "::/0" in get_keys(req_params, "cidrIpv6"))

    rules.matcher(
        lambda rec: (rec.get("detail") or {}).get("eventName") == "CreateImage",
        name="is_create_image",
        expr=lambda rec: rec["detail"]["eventName"] == "CreateImage",
    )

    @rules.rule(logs=["cloudwatch:events"], matchers=["is_create_image"],
                req_subkeys={"detail": ["requestParameters", "eventName"]},
                outputs=["slack:security"])
    def unencrypted_ami_volume(rec):
        """AMI created with no encrypted volume
        (cloudtrail_ec2_image_creation.py:5-34)."""
        req_params = safe_json_loads(rec["detail"].get("requestParameters") or "null")
        if not req_params:
            return False
        items = (req_params.get("blockDeviceMapping") or {}).get("items", [])
        if not items:
            return False
        encryption_flags = {
            (block_device.get("ebs") or {}).get("encrypted")
            for block_device in items
        }
        return not any(encryption_flags)

    rules.matcher(
        lambda rec: (rec.get("detail") or {}).get("eventName") == "ModifyImageAttribute",
        name="is_modify_image_attribute",
        expr=lambda rec: rec["detail"]["eventName"] == "ModifyImageAttribute",
    )

    @rules.rule(logs=["cloudwatch:events"], matchers=["is_modify_image_attribute"],
                req_subkeys={"detail": ["requestParameters", "eventName"]},
                outputs=["slack:security"])
    def public_ami(rec):
        """AMI launch permission granted to group `all`
        (cloudtrail_ec2_image_creation.py:37-62)."""
        req_params = safe_json_loads(rec["detail"].get("requestParameters") or "null")
        if not req_params:
            return False
        items = (req_params.get("launchPermission") or {}).get("add", {}).get("items", [])
        return any(item.get("group") == "all" for item in items)

    # ---- cloudtrail:events (flat record via Records[*]) ------------------

    @rules.rule(logs=["cloudtrail:events"], outputs=["slack:security"])
    def cloudtrail_critical_api_calls(rec):
        """Destructive / logging-disabling AWS API calls
        (cloudtrail_critical_api_calls.py:55-91). Scalar map values arrive
        as bare strings, so JSON `false` compares as 'false'."""
        if rec["eventName"] in _CRITICAL_EVENTS:
            return True
        params = rec.get("requestParameters") or {}
        if rec["eventName"] == "UpdateDetector":
            if params.get("enable") == "false":  # GuardDuty being disabled
                return True
        if rec["eventName"] in {"PutBucketPublicAccessBlock",
                                "PutAccountPublicAccessBlock"}:
            config = safe_json_loads(
                params.get("PublicAccessBlockConfiguration") or "{}")
            for action in _PUBLIC_ACCESS_BLOCK_ACTIONS:
                if config.get(action, True) is False:
                    return True
        if (rec["eventSource"] == "organizations.amazonaws.com"
                and rec["eventName"] in _AWS_ORG_EVENTS):
            return True
        return False

    @rules.rule(logs=["cloudtrail:events"], outputs=["slack:security"])
    def cloudtrail_mfa_policy_abuse_attempt(rec):
        """Non-MFA calls probing a flawed MFA-enforcement policy
        (cloudtrail_mfa_policy_abuse_attempt.py:20-72)."""
        session_context = safe_json_loads(
            (rec.get("userIdentity") or {}).get("sessionContext") or "{}")
        mfa_authenticated = (session_context.get("attributes") or {}).get(
            "mfaAuthenticated", "false")
        if mfa_authenticated == "true":
            return False
        if rec["eventName"] == "DeactivateMFADevice":
            return True
        if rec["eventName"] in _MFA_IAM_ACTIONS:
            return True
        # errorCode is an optional top-level key backfilled to '' (falsy)
        if rec.get("errorCode") and rec["eventName"] in _MFA_EVENT_NAMES:
            return True
        return False

    @rules.rule(logs=["cloudtrail:events"], outputs=["slack:security"])
    def cloudtrail_public_resources(rec):
        """Resource policies made internet-accessible across S3/ES/Glacier/
        SQS/SNS/ECR/KMS/SecretsManager
        (cloudtrail_public_resources.py:6-78)."""
        params = rec.get("requestParameters") or {}
        event = rec["eventName"]
        if event == "PutBucketPolicy":
            # S3 carries actual json, not a policy string
            policy = safe_json_loads(params.get("bucketPolicy") or "null")
            return _policy_is_internet_accessible(policy)

        policy_string = ""
        if event in {"CreateElasticsearchDomain", "UpdateElasticsearchDomainConfig"}:
            policy_string = params.get("accessPolicies", "")
        elif event == "SetVaultAccessPolicy":
            policy_string = safe_json_loads(params.get("policy") or "{}").get("policy", "")
        elif event == "SetQueueAttributes":
            policy_string = safe_json_loads(params.get("attributes") or "{}").get("Policy", "")
        elif event == "SetTopicAttributes":
            if params.get("attributeName", "") == "Policy":
                policy_string = params.get("attributeValue", "")
        elif event == "CreateTopic":
            policy_string = safe_json_loads(params.get("attributes") or "{}").get("Policy", "")
        elif event == "SetRepositoryPolicy":
            policy_string = params.get("policyText", "")
        elif event in {"PutKeyPolicy", "CreateKey"}:
            policy_string = params.get("policy", "")
        elif event == "PutResourcePolicy":
            policy_string = params.get("resourcePolicy", "")

        if policy_string:
            try:
                return _policy_is_internet_accessible(json.loads(policy_string))
            except (ValueError, TypeError):
                return False
        return False

    @rules.rule(logs=["cloudtrail:events"], outputs=["slack:security"])
    def cloudtrail_snapshot_or_ami_made_public(rec):
        """EBS/RDS snapshot or AMI shared with group `all`
        (cloudtrail_snapshot_or_ami_made_public.py:5-46)."""
        params = rec.get("requestParameters") or {}
        event = rec["eventName"]
        if event == "ModifyImageAttribute":
            if params.get("attributeType", "") == "launchPermission":
                launch = safe_json_loads(params.get("launchPermission") or "{}")
                items = (launch.get("add") or {}).get("items", [])
                return any(item.get("group", "") == "all" for item in items)
        if event == "ModifySnapshotAttribute":
            if params.get("attributeType", "") == "CREATE_VOLUME_PERMISSION":
                perm = safe_json_loads(params.get("createVolumePermission") or "{}")
                items = (perm.get("add") or {}).get("items", [])
                return any(item.get("group", "") == "all" for item in items)
        if event == "ModifyDBClusterSnapshotAttribute":
            values = safe_json_loads(params.get("valuesToAdd") or "[]")
            return "all" in (values if isinstance(values, list) else [])
        return False

    return rules
