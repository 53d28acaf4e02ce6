"""robots.txt (RFC 9309 Robots Exclusion Protocol) parsing and
rule compilation — the standard politeness gate at the head of every
web-crawl pipeline.

The reference engine ingests pre-fetched uploads and never crawls, so
it has no REP stage; a Common-Crawl-scale corpus pipeline needs one
(CC itself publishes the robots responses it honored). This module is
public-spec-only: RFC 9309 plus the widely-implemented ``*`` / ``$``
pattern extensions.

Design for SQL-twin parity: a parsed rule compiles to a SQL ``LIKE``
pattern (``*`` -> ``%``, literal ``%``/``_``/``\\`` escaped, a final
``$`` anchors by *omitting* the trailing ``%``), and rule precedence
is RFC 9309 longest-match — ``length(pattern)`` octets, allow wins
ties — so the whole match resolves as a join + window in BOTH Spark
and DuckDB with zero engine-specific behavior.

Group selection follows the RFC: every group whose ``User-agent``
product tokens name this crawler exactly (case-insensitive) is
merged; only when none does, the ``*`` groups apply. Non-rule lines
(``Crawl-delay``, ``Sitemap``, comments) are ignored. An empty
``Disallow:`` value is "allow everything" and emits no rule.
"""

from __future__ import annotations

DEFAULT_AGENT = "medcharity-bot"

# LIKE-special characters that must be escaped when a robots pattern
# is compiled to a LIKE pattern (backslash first — it is the escape)
_LIKE_ESCAPES = (("\\", "\\\\"), ("%", "\\%"), ("_", "\\_"))


def parse_robots(text: str, agent: str = DEFAULT_AGENT) -> list[tuple[str, bool]]:
    """Parse a robots.txt body into ``[(pattern, allow)]`` for *agent*.

    Implements RFC 9309 group semantics: a group is one-or-more
    ``User-agent`` lines followed by rule lines; groups for the same
    agent merge; an exact agent match suppresses the ``*`` groups.
    Patterns are returned verbatim (including ``*`` / ``$``); rules
    whose pattern is empty are dropped (empty Disallow = allow all).
    """
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_agent_run = False  # consecutive UA lines stack into one group

    def flush() -> None:
        nonlocal cur_agents, cur_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules = [], []

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                flush()
                in_agent_run = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if value:
                cur_rules.append((value, field == "allow"))
        else:
            # crawl-delay / sitemap / host / unknown: not rules, but a
            # non-UA line does end a user-agent run (RFC 9309 §2.2.1)
            in_agent_run = False
    flush()

    exact = [r for agents, rules in groups if agent in agents for r in rules]
    if any(agent in agents for agents, _ in groups):
        return exact
    return [r for agents, rules in groups if "*" in agents for r in rules]


def pattern_to_like(pattern: str) -> str:
    """Compile a robots path pattern to a SQL LIKE pattern.

    ``*`` becomes ``%``; a single final ``$`` anchors the end (no
    trailing ``%``); LIKE metacharacters in the literal parts are
    backslash-escaped. Both engines evaluate it identically — Spark's
    LIKE escape default is ``\\`` and the DuckDB twin says
    ``ESCAPE '\\'`` explicitly (DuckDB has NO default escape).
    """
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        else:
            for src, dst in _LIKE_ESCAPES:
                if ch == src:
                    out.append(dst)
                    break
            else:
                out.append(ch)
    like = "".join(out)
    if not anchored:
        like += "%"
    return like


def synthesize_robots(host_idx: int) -> str:
    """Deterministic per-host robots.txt for the synthetic corpus.

    Three shapes by ``host_idx % 3`` (all also carry comment lines, a
    blocked scraper group, mixed-case field names, and non-rule
    directives, so the parser earns its keep):

    - ``0``: a group naming THIS crawler — ``Disallow: /doc/1`` with a
      longer ``Allow: /doc/12`` carve-out (longest-match precedence);
      the ``*`` group must then be ignored.
    - ``1``: only a ``*`` group with a wildcard+anchor rule
      ``Disallow: /doc/*7$`` (blocks ids ending in 7).
    - ``2``: a ``*`` group whose ``Disallow:`` is EMPTY (allow all).
    """
    shape = host_idx % 3
    lines = [
        f"# robots.txt for host{host_idx}.example.com",
        "User-agent: badscraper",
        "Disallow: /",
        "",
    ]
    if shape == 0:
        lines += [
            "User-AGENT: medcharity-bot",
            "user-agent: partner-bot",
            "Allow: /doc/12",
            "DISALLOW: /doc/1",
            "Crawl-delay: 2",
            "",
        ]
    if shape == 1:
        lines += [
            "User-agent: *",
            "Disallow: /doc/*7$  # no lucky sevens",
            "Disallow: /admin/",
            "",
        ]
    else:
        # shape 0: this group must be IGNORED (exact-agent group wins);
        # shape 2: empty Disallow value = allow everything, zero rules
        lines += [
            "User-agent: *",
            "Disallow: /admin/" if shape == 0 else "Disallow:",
            "",
        ]
    lines.append("Sitemap: https://host%d.example.com/sitemap.xml" % host_idx)
    return "\n".join(lines) + "\n"
