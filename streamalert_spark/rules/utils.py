"""Deep-search + IP utilities for rule bodies.

Parity with the reference's shared/utils.py: ``get_first_key`` /
``get_keys`` (BFS over nested dict/list, utils.py:56-146 — skips the
normalization key so schema/normalized name collisions don't leak
normalization data into rule logic), ``valid_ip`` / ``in_network``
(utils.py:13-54, netaddr replaced by stdlib ``ipaddress``; ``'::1'`` is
explicitly invalid to match utils.py:22-24).

These are UDF-side helpers (SURVEY §2.4): engine-side extraction uses
generated column paths, but arbitrary rule bodies need the dynamic walk.
"""

from __future__ import annotations

import ipaddress
from collections import deque
from typing import Any

NORMALIZATION_KEY = "streamalert_normalization"

_CONTAINER_TYPES = (dict, list)


def valid_ip(ip_address: Any) -> bool:
    """True iff the string parses as an IPv4/IPv6 address; '::1' is
    rejected (utils.py:13-30)."""
    if ip_address == "::1":
        return False
    try:
        ipaddress.ip_address(str(ip_address))
    except (ValueError, TypeError):
        return False
    return True


def in_network(ip_address: Any, cidrs: Any) -> bool:
    """True iff the address falls inside any of the CIDR strings; invalid
    CIDRs are skipped, invalid addresses return False (utils.py:33-54)."""
    if not valid_ip(ip_address):
        return False
    addr = ipaddress.ip_address(str(ip_address))
    for cidr in cidrs or ():
        try:
            network = ipaddress.ip_network(str(cidr), strict=False)
        except ValueError:
            continue
        if addr.version == network.version and addr in network:
            return True
    return False


def get_keys(data: Any, search_key: str, max_matches: int = -1) -> list:
    """All values under ``search_key`` anywhere in the nested structure
    (BFS with a deque, utils.py:79-146). Values under the normalization
    key are never traversed; falsy containers are not enqueued."""
    containers: deque = deque()
    containers.append(data)
    results: list = []
    while containers:
        obj = containers.popleft()
        if isinstance(obj, dict):
            if search_key in obj:
                results.append(obj[search_key])
                if 0 < max_matches == len(results):
                    return results
            for key, val in obj.items():
                if key in (NORMALIZATION_KEY, "streamalert:normalization"):
                    continue
                if val and isinstance(val, _CONTAINER_TYPES):
                    containers.append(val)
        else:
            for val in obj:
                if val and isinstance(val, _CONTAINER_TYPES):
                    containers.append(val)
    return results


def get_first_key(data: Any, search_key: str, default_value: Any = None) -> Any:
    """First value for ``search_key`` anywhere in the structure
    (utils.py:56-71)."""
    keys = get_keys(data, search_key, max_matches=1)
    return keys[0] if keys else default_value
