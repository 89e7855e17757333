"""robots.txt parsing → the engine's ordered first-match rule lists.

The reference world ships pre-parsed rule dicts; a real deployment gets
raw robots.txt bodies. ``parse_robots_txt`` implements the de-facto
standard (RFC 9309 shape): user-agent groups, Allow/Disallow path
prefixes, Crawl-delay. Rule precedence in the wild is LONGEST-MATCH
(most-specific path wins, Allow wins ties); the engine evaluates rules
FIRST-MATCH in list order (stages/politeness.py:_allowed), so the parser
emits rules sorted by (prefix length desc, allow first) — the sorted
first-match list decides identically to longest-match.

Output shape is exactly what ``init_run(robots=...)`` and the politeness
scheduler consume: ``{"crawl_delay_ms": int, "rules": [{"allow": bool,
"path_prefix": str}, ...]}``.
"""

from __future__ import annotations

DEFAULT_DELAY_MS = 1000


def parse_robots_txt(text: str, user_agent: str = "*",
                     default_delay_ms: int = DEFAULT_DELAY_MS) -> dict:
    """Parse one robots.txt body for *user_agent*.

    Group selection follows the standard: the most specific matching
    user-agent group wins (exact token match beats ``*``); multiple
    ``User-agent`` lines stack onto the following directive block.
    Unknown directives and comments are ignored; an empty ``Disallow:``
    means allow-all (contributes no rule).
    """
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]], int | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: int | None = None
    in_group_body = False

    def flush() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:        # new group starts after directives
                flush()
                in_group_body = False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val:                  # empty Disallow == allow everything
                cur_rules.append((key == "allow", val))
            elif key == "disallow":
                pass                 # explicit allow-all: no rule needed
        elif key == "crawl-delay":
            in_group_body = True
            try:
                cur_delay = int(float(val) * 1000)
            except ValueError:
                pass
    flush()

    # most specific matching group: exact agent substring beats "*"
    best: tuple[list[tuple[bool, str]], int | None] | None = None
    best_score = -1
    for agents, rules, delay in groups:
        for a in agents:
            if a == "*":
                score = 0
            elif a and a in ua:
                score = len(a)
            else:
                continue
            if score > best_score:
                best, best_score = (rules, delay), score
    if best is None:
        return {"crawl_delay_ms": default_delay_ms,
                "rules": [{"allow": True, "path_prefix": "/"}]}
    rules, delay = best
    # longest-match semantics via a sorted first-match list:
    # longer prefixes first; on equal length Allow outranks Disallow
    ordered = sorted(rules, key=lambda r: (-len(r[1]), not r[0]))
    out = [{"allow": allow, "path_prefix": pfx} for allow, pfx in ordered]
    out.append({"allow": True, "path_prefix": "/"})   # default allow
    return {"crawl_delay_ms": delay if delay is not None
            else default_delay_ms, "rules": out}


def robots_from_texts(texts: dict[str, str],
                      user_agent: str = "*") -> dict[str, dict]:
    """host → robots.txt body ⇒ the broadcastable lookup ``init_run``
    consumes (host → {crawl_delay_ms, rules})."""
    return {host: parse_robots_txt(body, user_agent)
            for host, body in texts.items()}
