"""DuckDB oracle SQL for the ETL composites (hash-grade correctness).

Until round 3 the ETL registry entries recorded rows-only driver checks
(no oracle); the hard evidence lived in tests/test_etl_golden.py. This
module gives the driver the same SQL-replay the golden test performs:
one CTE chain over the reference's own CSVs (semantics of
loan_pipeline.py, which itself mirrors reference pipeline.py:39-492 /
queries.sql:1-245), with the golden run's injected clock, so every ETL
surface gets a row-count + schema + value-hash comparison
(VERDICT r2 "Next round" #5).

DuckDB-1.0 compat (BASELINE.md:14-18): the reference's
``strict_mode=false`` read option becomes ``ignore_errors=true``;
semantics on this data are identical (verified: 200 rows, 13 sniffed
columns, 1 over-wide row).

Cross-engine rules applied (memory: spark-duckdb-parity-tricks):
- counters pinned BIGINT (DuckDB SUM would emit HUGEINT, which the
  driver hasher serializes differently);
- ratios forced through CAST(... AS DOUBLE) before division (a bare
  ``1.0 *`` promotes to DECIMAL in DuckDB);
- the problematic-id list serializes via to_json (array text
  ``["APP001",...,null]`` matches Spark's to_json exactly);
- timestamps/dates are naive literals of the golden run's clock.
"""

from __future__ import annotations

import os

from duckdb_data_eng_proj_spark.etl.loan_pipeline import (
    APP_COLUMNS,
    APP_FLAG_NAMES,
    LMS_COLUMNS,
    LMS_FLAG_NAMES,
)

_REF = os.environ.get("SPARK_GRAFT_REFERENCE_DIR", "/root/reference")
_RUN_TS = "TIMESTAMP '2026-01-23 12:30:57'"  # the golden run's clock
_AS_OF = "DATE '2026-01-23'"

_READ_OPTS = (
    "header=true, delim=',', quote='\"', escape='\"', "
    "ignore_errors=true, null_padding=true, all_varchar=true"
)

_BUCKET = (
    "CASE WHEN {d} IS NULL THEN NULL "
    "WHEN {d} = 0 THEN 'Current' "
    "WHEN {d} BETWEEN 1 AND 30 THEN 'Late' "
    "WHEN {d} BETWEEN 31 AND 90 THEN 'Delinquent' "
    "ELSE 'Default' END"
)


def _json_flags(names: list[str]) -> str:
    keys = ", ".join(f"'{n}'" for n in names)
    vals = ", ".join(f"flag_{n}" for n in names)
    return f"to_json(MAP([{keys}], [{vals}]))"


def _any_flag(names: list[str]) -> str:
    return " OR ".join(f"coalesce(flag_{n}, false)" for n in names)


_APP_FLAGS_SQL = f"""
    (application_id IS NULL OR TRIM(application_id) = '')
      AS flag_application_id_null,
    application_id IN (SELECT application_id FROM app_dupes)
      AS flag_application_id_duplicate,
    (loan_amount_eur IS NULL OR loan_amount_eur <= 0)
      AS flag_loan_amount_non_positive,
    credit_score IS NULL AS flag_credit_score_missing,
    (credit_score IS NOT NULL AND (credit_score < 300 OR credit_score > 850))
      AS flag_credit_score_out_of_range,
    (postal_code IS NULL OR NOT regexp_matches(postal_code, '^[0-9]{{5}}$'))
      AS flag_postal_code_invalid,
    (installation_type IS NULL
     OR installation_type NOT IN ('solar_pv', 'solar_battery', 'heat_pump'))
      AS flag_installation_type_invalid,
    (installation_type IN ('solar_pv', 'solar_battery')
     AND (system_size_kwp IS NULL OR system_size_kwp <= 0))
      AS flag_system_size_invalid,
    (installation_type = 'heat_pump' AND system_size_kwp IS NOT NULL)
      AS flag_system_size_present_for_heat_pump
"""

_LMS_FLAGS_SQL = """
    (loan_id IS NULL OR TRIM(loan_id) = '') AS flag_loan_id_null,
    (application_id IS NULL OR TRIM(application_id) = '')
      AS flag_application_id_null,
    (application_id IS NOT NULL
     AND NOT regexp_matches(application_id, '^APP[0-9]+$'))
      AS flag_application_id_invalid_format,
    loan_id IN (SELECT loan_id FROM loan_dupes) AS flag_loan_id_duplicate,
    application_id IN (SELECT application_id FROM lms_app_dupes)
      AS flag_application_id_duplicate,
    (current_balance_eur IS NOT NULL AND current_balance_eur < 0)
      AS flag_current_balance_negative,
    (days_past_due IS NOT NULL AND days_past_due < 0)
      AS flag_days_past_due_negative,
    (last_payment_date IS NOT NULL AND disbursement_date IS NOT NULL
     AND last_payment_date < disbursement_date)
      AS flag_last_payment_before_disbursement,
    (next_payment_due IS NOT NULL AND disbursement_date IS NOT NULL
     AND next_payment_due < disbursement_date)
      AS flag_next_due_before_disbursement,
    (last_payment_date IS NOT NULL AND next_payment_due IS NOT NULL
     AND last_payment_date > next_payment_due)
      AS flag_last_payment_after_next_due
"""

_APPS_SELECT = ", ".join(f"a.{c} AS {c}" for c in APP_COLUMNS) + (
    ", "
    + ", ".join(f"a.flag_{n} AS flag_{n}" for n in APP_FLAG_NAMES)
    + ", a.risk_category AS risk_category"
    + ", a.loan_to_income_ratio AS loan_to_income_ratio"
    + ", a.data_quality_flags AS data_quality_flags"
    + ", a.processed_at AS processed_at"
)

_APP_COUNTERS = ", ".join(
    f"CAST(sum(CAST(flag_{n} AS INT)) AS BIGINT) AS app_{n}" for n in APP_FLAG_NAMES
)
_LMS_COUNTERS = ", ".join(
    f"CAST(sum(CAST(flag_{n} AS INT)) AS BIGINT) AS lms_{n}" for n in LMS_FLAG_NAMES
)


def _prelude(ref_dir: str = _REF) -> str:
    return f"""
WITH raw_apps AS (
  SELECT * FROM read_csv('{ref_dir}/data/applications_expanded.csv', {_READ_OPTS})
),
bad AS (
  SELECT * FROM raw_apps WHERE column12 IS NOT NULL AND TRIM(column12) <> ''
),
good AS (
  SELECT {", ".join(APP_COLUMNS)} FROM raw_apps
  WHERE column12 IS NULL OR TRIM(column12) = ''
),
app_dupes AS (
  SELECT application_id FROM good GROUP BY 1 HAVING count(*) > 1
),
apps_typed AS (
  SELECT application_id,
         regexp_replace(lower(customer_email), '\\s+', '', 'g') AS customer_email,
         installer_partner_id,
         installation_type,
         TRY_CAST(system_size_kwp AS DOUBLE) AS system_size_kwp,
         TRY_CAST(loan_amount_eur AS DOUBLE) AS loan_amount_eur,
         TRY_CAST(loan_term_months AS INTEGER) AS loan_term_months,
         TRY_CAST(application_date AS DATE) AS application_date,
         TRY_CAST(credit_score AS INTEGER) AS credit_score,
         TRY_CAST(annual_income_eur AS DOUBLE) AS annual_income_eur,
         postal_code,
         lower(status) AS status
  FROM good
),
apps_flagged AS (
  SELECT *, {_APP_FLAGS_SQL} FROM apps_typed
),
cleaned_apps AS (
  SELECT *,
    CASE WHEN credit_score IS NULL THEN 'Unknown'
         WHEN credit_score < 300 OR credit_score > 850 THEN 'Invalid'
         WHEN credit_score >= 750 THEN 'Excellent'
         WHEN credit_score BETWEEN 700 AND 749 THEN 'Good'
         WHEN credit_score BETWEEN 650 AND 699 THEN 'Fair'
         ELSE 'Poor' END AS risk_category,
    CASE WHEN annual_income_eur IS NULL OR annual_income_eur <= 0
              OR flag_loan_amount_non_positive THEN NULL
         ELSE loan_amount_eur / annual_income_eur END AS loan_to_income_ratio,
    {_json_flags(APP_FLAG_NAMES)} AS data_quality_flags,
    {_RUN_TS} AS processed_at
  FROM apps_flagged
),
raw_lms AS (
  SELECT * FROM read_csv('{ref_dir}/data/lms_updates_expanded.csv', {_READ_OPTS})
),
loan_dupes AS (
  SELECT loan_id FROM raw_lms
  WHERE NOT (loan_id IS NULL OR TRIM(loan_id) = '')
  GROUP BY 1 HAVING count(*) > 1
),
lms_app_dupes AS (
  SELECT application_id FROM raw_lms
  WHERE NOT (application_id IS NULL OR TRIM(application_id) = '')
  GROUP BY 1 HAVING count(*) > 1
),
lms_typed AS (
  SELECT loan_id,
         application_id,
         TRY_CAST(disbursement_date AS DATE) AS disbursement_date,
         TRY_CAST(current_balance_eur AS DOUBLE) AS current_balance_eur,
         TRY_CAST(days_past_due AS INTEGER) AS days_past_due,
         lower(payment_status) AS payment_status,
         TRY_CAST(last_payment_date AS DATE) AS last_payment_date,
         TRY_CAST(next_payment_due AS DATE) AS next_payment_due
  FROM raw_lms
),
lms_flagged AS (
  SELECT *, {_LMS_FLAGS_SQL} FROM lms_typed
),
lms_cleaned AS (
  SELECT *,
    {_BUCKET.format(d="days_past_due")} AS delinquency_bucket,
    {_json_flags(LMS_FLAG_NAMES)} AS data_quality_flags,
    {_RUN_TS} AS processed_at
  FROM lms_flagged
),
portfolio AS (
  SELECT {_APPS_SELECT},
    l.loan_id AS loan_id,
    l.application_id AS lms_application_id,
    l.disbursement_date AS disbursement_date,
    l.current_balance_eur AS current_balance_eur,
    l.days_past_due AS days_past_due,
    l.payment_status AS payment_status,
    l.last_payment_date AS last_payment_date,
    l.next_payment_due AS next_payment_due,
    l.flag_loan_id_null AS flag_loan_id_null,
    l.flag_application_id_null AS flag_application_id_null_lms,
    l.flag_application_id_invalid_format AS flag_application_id_invalid_format,
    l.flag_current_balance_negative AS flag_current_balance_negative,
    l.flag_days_past_due_negative AS flag_days_past_due_negative,
    l.flag_last_payment_before_disbursement
      AS flag_last_payment_before_disbursement,
    l.flag_next_due_before_disbursement AS flag_next_due_before_disbursement,
    l.flag_last_payment_after_next_due AS flag_last_payment_after_next_due,
    l.data_quality_flags AS lms_data_quality_flags,
    l.processed_at AS lms_processed_at,
    {_BUCKET.format(d="l.days_past_due")} AS delinquency_bucket,
    CASE WHEN l.disbursement_date IS NULL THEN NULL
         ELSE CAST(date_diff('month', l.disbursement_date, {_AS_OF}) AS INT)
    END AS months_since_disbursement
  FROM cleaned_apps a LEFT JOIN lms_cleaned l
    ON a.application_id = l.application_id
),
problem_ids AS (
  SELECT DISTINCT application_id FROM cleaned_apps WHERE {_any_flag(APP_FLAG_NAMES)}
  UNION
  SELECT DISTINCT application_id FROM lms_cleaned WHERE {_any_flag(LMS_FLAG_NAMES)}
),
report AS (
  SELECT ac.*, qc.quarantined_applications, lc.*, ia.problematic_application_ids,
         {_RUN_TS} AS processed_at
  FROM (SELECT count(*) AS applications_processed, {_APP_COUNTERS}
        FROM cleaned_apps) ac,
       (SELECT count(*) AS lms_processed, {_LMS_COUNTERS} FROM lms_cleaned) lc,
       (SELECT count(*) AS quarantined_applications FROM bad) qc,
       (SELECT to_json(array_agg(application_id
                       ORDER BY application_id ASC NULLS LAST))
          AS problematic_application_ids
        FROM problem_ids) ia
)
"""


def _strict_ctes() -> str:
    """Strict-spec summary (etl_strict_spec): the checks the spec
    requires but the reference never implemented — see
    loan_pipeline.strict_spec_checks."""
    return f""",
strict_apps AS (
  SELECT application_id,
         max(status = 'approved') AS approved,
         min(loan_amount_eur) AS orig,
         min(loan_term_months) AS term,
         min(application_date) AS app_date
  FROM cleaned_apps GROUP BY 1
),
strict AS (
  SELECT l.*,
    NOT coalesce(a.approved, false) AS f_na,
    (l.current_balance_eur IS NOT NULL AND a.orig IS NOT NULL
     AND l.current_balance_eur > a.orig) AS f_be,
    (l.disbursement_date IS NOT NULL AND a.app_date IS NOT NULL
     AND l.disbursement_date < a.app_date) AS f_da,
    CASE WHEN a.orig IS NOT NULL AND a.term IS NOT NULL AND a.term > 0
              AND l.disbursement_date IS NOT NULL
         THEN greatest(0.0, least(a.orig, a.orig * (1 -
              CAST(date_diff('month', l.disbursement_date, {_AS_OF}) AS DOUBLE)
              / a.term)))
    END AS est
  FROM lms_cleaned l LEFT JOIN strict_apps a USING (application_id)
)
"""


def _oracles(ref_dir: str = _REF) -> dict[str, str]:
    p = _prelude(ref_dir)
    lower_approved = "lower(status) = 'approved'"
    appr1 = f"CASE WHEN {lower_approved} THEN 1 ELSE 0 END"
    q: dict[str, str] = {}
    q["etl_quarantine"] = p + "SELECT * FROM bad"
    q["etl_clean_apps"] = p + "SELECT * FROM cleaned_apps"
    q["etl_clean_lms"] = p + "SELECT * FROM lms_cleaned"
    q["etl_portfolio"] = p + "SELECT * FROM portfolio"
    q["etl_quality_report"] = p + "SELECT * FROM report"
    q["etl_q0"] = p + (
        "SELECT * FROM portfolio WHERE application_id IS NOT NULL "
        "AND application_id NOT IN "
        "(SELECT application_id FROM problem_ids WHERE application_id IS NOT NULL)"
    )
    q["etl_q1"] = p + f"""
SELECT date_trunc('month', application_date) AS cohort_month,
       installation_type,
       count(*) AS total_applications,
       CAST(sum({appr1}) AS INT) AS approved_applications,
       round(CAST(sum({appr1}) AS DOUBLE) / nullif(count(*), 0), 4)
         AS approval_rate,
       round(sum(coalesce(CASE WHEN {lower_approved} THEN loan_amount_eur END,
                          0.0)), 2) AS total_approved_loan_volume,
       round(avg(CASE WHEN {lower_approved} THEN loan_amount_eur END), 2)
         AS avg_approved_loan_size
FROM portfolio WHERE application_date IS NOT NULL GROUP BY 1, 2
"""
    q["etl_q2"] = p + """
SELECT loan_id, application_id, installer_partner_id, installation_type,
       credit_score, current_balance_eur, loan_amount_eur, annual_income_eur,
       loan_to_income_ratio, application_date, disbursement_date,
       delinquency_bucket, days_past_due, months_since_disbursement, status
FROM portfolio
WHERE NOT flag_credit_score_out_of_range AND NOT flag_credit_score_missing
  AND NOT flag_loan_id_null AND loan_to_income_ratio IS NOT NULL
  AND credit_score < 680 AND loan_to_income_ratio > 0.35
"""
    dlq1 = "CASE WHEN days_past_due > 30 THEN 1 ELSE 0 END"
    q["etl_q3"] = p + f"""
SELECT installer_partner_id, count(*) AS total_loans,
       CAST(sum({dlq1}) AS BIGINT) AS delinquent_loans,
       round(CAST(sum({dlq1}) AS DOUBLE) / nullif(count(*), 0), 4)
         AS delinquency_rate
FROM portfolio WHERE NOT flag_loan_id_null GROUP BY 1
"""
    rates = ", ".join(
        f"round(CAST(sum(CASE WHEN days_past_due >= {d} THEN 1 ELSE 0 END) "
        f"AS DOUBLE) / nullif(count(*), 0), 4) AS dpd_{d}_rate"
        for d in (30, 60, 90)
    )
    q["etl_q4"] = p + f"""
SELECT date_trunc('month', disbursement_date) AS cohort_month,
       count(*) AS total_loans, {rates}
FROM portfolio
WHERE disbursement_date IS NOT NULL AND NOT flag_loan_id_null GROUP BY 1
"""
    q["etl_q5"] = p + f""",
monthly AS (
  SELECT date_trunc('month', application_date) AS cohort_month,
         installation_type,
         round(sum(CASE WHEN {lower_approved} THEN loan_amount_eur
                        ELSE 0.0 END), 2) AS approved_loan_volume
  FROM portfolio
  WHERE application_date IS NOT NULL AND NOT flag_installation_type_invalid
  GROUP BY 1, 2
)
SELECT cohort_month, installation_type, approved_loan_volume,
       round(approved_loan_volume /
             nullif(sum(approved_loan_volume)
                    OVER (PARTITION BY cohort_month), 0.0), 4)
         AS monthly_volume_share
FROM monthly
"""
    q["etl_strict_spec"] = p + _strict_ctes() + """
SELECT count(*) AS n_rows,
       CAST(sum(CAST(f_na AS INT)) AS BIGINT) AS n_not_approved,
       CAST(sum(CAST(f_be AS INT)) AS BIGINT) AS n_balance_exceeds,
       CAST(sum(CAST(f_da AS INT)) AS BIGINT) AS n_disb_before_app,
       count(est) AS n_est_present,
       CAST(sum(CAST(round(est * 100, 0) AS BIGINT)) AS DOUBLE) / 100
         AS est_total
FROM strict
"""
    return q


ETL_ORACLES: dict[str, str] = _oracles()

__all__ = ["ETL_ORACLES"]
