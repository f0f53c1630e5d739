"""Hive variable substitution — the CLI/script preprocessing layer.

Reference: ``common/.../VariableSubstitution.java`` (MAX_SUBST = 40)
+ ``cli/.../CliDriver.java`` / ``OptionsProcessor.java`` (``SET``,
``--hivevar``, ``--define``). Every production Hive script leans on
``${hivevar:dt}``-style parameters, so a migration engine needs the
same preprocessing in front of ``spark.sql``:

- ``${hivevar:name}`` / bare ``${name}`` → the session's hivevar map
  (bare names resolve against hivevars, Hive's behavior since
  HIVE-2020);
- ``${hiveconf:prop}`` → the Spark session conf (the engine's conf
  store — same role Hive's HiveConf plays);
- ``${env:NAME}`` → process environment;
- ``${system:prop}`` → a small system map (user.name etc. — the JVM
  system-property analogues that exist here).

Expansion is TEXT preprocessing before parsing, exactly like the
reference: it applies everywhere in the statement, including inside
string literals (Hive substitutes first and parses second), values
may themselves contain ``${...}`` and re-expand, and more than 40
nested rounds is an error (the reference's infinite-recursion
guard). Unresolvable references are left verbatim — the reference
does the same and lets the parser complain.

``SET`` statements are handled here too (CliDriver SetProcessor):
``SET hivevar:k=v`` defines a variable, ``SET k=v`` writes the
session conf, ``SET k`` / ``SET hivevar:k`` prints one value,
``SET`` lists hivevars.
"""

from __future__ import annotations

import getpass
import os
import re

MAX_SUBST = 40  # VariableSubstitution.java:37

_REF = re.compile(r"\$\{([^}$\{]+)\}")


class SubstitutionDepthError(ValueError):
    """More than MAX_SUBST nested expansions (reference behavior)."""


class VariableContext:
    """Session-scoped hivevar store + ``SET``/substitution front end."""

    def __init__(self, hivevars: dict[str, str] | None = None) -> None:
        self.hivevars: dict[str, str] = dict(hivevars or {})

    # -- resolution ----------------------------------------------------
    def _lookup(self, spark, ref: str) -> str | None:
        if ref.startswith("hivevar:"):
            return self.hivevars.get(ref[8:])
        if ref.startswith("hiveconf:"):
            return spark.conf.get(ref[9:], None)
        if ref.startswith("env:"):
            return os.environ.get(ref[4:])
        if ref.startswith("system:"):
            key = ref[7:]
            if key == "user.name":
                return getpass.getuser()
            if key == "os.name":
                return os.name
            return None
        # bare name → hivevar (HIVE-2020)
        return self.hivevars.get(ref)

    def substitute(self, spark, text: str) -> str:
        """Expand ``${...}`` references, re-scanning so values that
        contain references expand too; unresolved refs stay put."""
        for _ in range(MAX_SUBST):
            changed = False

            def repl(m: re.Match) -> str:
                nonlocal changed
                v = self._lookup(spark, m.group(1))
                if v is None:
                    return m.group(0)
                changed = True
                return v

            text = _REF.sub(repl, text)
            if not changed:
                return text
        raise SubstitutionDepthError(
            f"variable substitution exceeded {MAX_SUBST} nested rounds"
        )

    # -- SET / statement front end ------------------------------------
    _SET = re.compile(
        r"\s*SET(?:\s+(.*?))?\s*$", re.IGNORECASE | re.DOTALL
    )

    def sql(self, spark, statement: str):
        """Run one statement: ``SET`` forms are handled locally
        (returning a small DataFrame of (key, value) rows, like
        beeline renders); everything else is substituted and handed
        to ``spark.sql``."""
        m = self._SET.match(statement)
        if m and not (m.group(1) or "").startswith("("):
            body = self.substitute(spark, m.group(1) or "").strip()
            if not body:  # SET → list hivevars
                rows = sorted(self.hivevars.items())
                return spark.createDataFrame(
                    rows or [("", "")], "key string, value string"
                ).filter("key <> ''")
            if "=" in body:
                key, _, value = body.partition("=")
                key, value = key.strip(), value.strip()
                if key.startswith("hivevar:"):
                    self.hivevars[key[8:]] = value
                elif key.startswith("hiveconf:"):
                    # strip the namespace like Hive's SetProcessor:
                    # storing the literal 'hiveconf:k' key would make
                    # ${hiveconf:k} (which reads conf 'k') and SET k
                    # unable to ever see the value
                    spark.conf.set(key[9:], value)
                else:
                    spark.conf.set(key, value)
                return spark.createDataFrame(
                    [(key, value)], "key string, value string"
                )
            # explicit None check, not `or`: a variable legitimately
            # set to the EMPTY STRING is falsy and fell through to the
            # hiveconf lookup, printing <undefined> for a defined var
            v = self._lookup(spark, body)
            if v is None:
                v = self._lookup(spark, "hiveconf:" + body)
            return spark.createDataFrame(
                [(body, "<undefined>" if v is None else v)],
                "key string, value string",
            )
        return spark.sql(self.substitute(spark, statement))
