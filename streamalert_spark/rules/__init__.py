from streamalert_spark.rules.registry import Rule, RuleRegistry, rule, matcher
from streamalert_spark.rules.engine import RulesEngine

__all__ = ["Rule", "RuleRegistry", "rule", "matcher", "RulesEngine"]
