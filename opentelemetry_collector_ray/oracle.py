"""DuckDB oracle SQL for every SQL-expressible pipeline/operator.

The driver runs each ``queries()`` callable AND the matching SQL string
below over the same Parquet tables (pre-registered views: region nation
customer supplier part orders lineitem events documents embeddings) and
compares row count + schema + order-insensitive value hash. Column
names and dtypes are chosen to match the Ray output exactly.

The transcript CTE is shared: a deterministic projection of ``events``
into the input-hint shape (see sources/transcripts.py for the Ray side;
the two must stay in lockstep).
"""

# events → transcripts (must mirror sources/transcripts.py exactly).
TRANSCRIPTS_CTE = """
WITH transcripts AS (
  SELECT
    'conv-' || lpad(cast(user_id AS varchar), 8, '0') AS conv_id,
    cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
         AS integer) AS turn_idx,
    CASE event_type WHEN 'error' THEN 'tool' WHEN 'signup' THEN 'system'
         WHEN 'purchase' THEN 'assistant' ELSE 'user' END AS role,
    '[' || CASE event_type WHEN 'error' THEN 'ERROR' WHEN 'signup' THEN 'WARN'
           WHEN 'purchase' THEN 'INFO' ELSE 'DEBUG' END
        || '] action=' || event_type
        || ' latency_ms=' || cast(cast(floor(value) AS bigint) AS varchar)
        || ' msg=' || props AS text,
    CASE event_type WHEN 'error' THEN 'bash' WHEN 'purchase' THEN 'sql'
         ELSE '' END AS tool,
    ts
  FROM events
)
"""

# Parsed view on top of transcripts — mirrors stages/parse.py GROK_PATTERN.
_GROK_SQL = r"'^\[([A-Z]+)\] action=(\w+) latency_ms=(\d+) msg=(.*)$'"

PARSED_CTE = TRANSCRIPTS_CTE + f"""
, parsed AS (
  SELECT *,
    coalesce(regexp_matches(text, {_GROK_SQL}), false) AS parse_ok
  FROM transcripts
),
parsed2 AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
    CASE WHEN parse_ok THEN regexp_extract(text, {_GROK_SQL}, 1) END AS level,
    CASE WHEN parse_ok THEN regexp_extract(text, {_GROK_SQL}, 2) END AS action,
    CASE WHEN parse_ok THEN cast(regexp_extract(text, {_GROK_SQL}, 3) AS bigint) END AS latency_ms,
    CASE WHEN parse_ok THEN regexp_extract(text, {_GROK_SQL}, 4) END AS msg,
    parse_ok
  FROM parsed
)
"""

# Enriched view — mirrors schema.DIM_TOOL_SERVICE / DIM_ROLE_ROUTE.
ENRICHED_CTE = PARSED_CTE + """
, enriched AS (
  SELECT *,
    CASE tool WHEN 'bash' THEN 'infra' WHEN 'browser' THEN 'web'
         WHEN 'python' THEN 'compute' WHEN 'sql' THEN 'data'
         ELSE 'unknown' END AS service,
    CASE role WHEN 'user' THEN 'ingest' WHEN 'assistant' THEN 'replies'
         WHEN 'tool' THEN 'tooling' WHEN 'system' THEN 'audit'
         ELSE 'ingest' END AS route
  FROM parsed2
)
"""

# Exploded routing — mirrors stages/route.py explode_sinks_batch.
ROUTED_CTE = ENRICHED_CTE + """
, routed AS (
  SELECT *, route AS sink FROM enriched
  UNION ALL
  SELECT *, 'errors' AS sink FROM enriched WHERE level = 'ERROR'
)
"""
