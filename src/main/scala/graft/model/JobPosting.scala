package graft.model

import java.sql.{Date, Timestamp}

/** Typed view of a cleaned staging row (SURVEY.md §1.4: case-class
  * `Dataset` at the cleaning layer where per-row semantics live;
  * `DataFrame` everywhere schema is dynamic). Field names/order match
  * [[Schemas.stagingJob]] so `.as[JobPosting]` is a free cast — no
  * extra serialization until an operation actually needs objects.
  */
final case class JobPosting(
    job_id: String,
    job_title: Option[String],
    company_name: Option[String],
    salary: Option[String],
    min_salary_vnd: Option[Long],
    max_salary_vnd: Option[Long],
    location: Option[String],
    experience_required: Option[String],
    posted_time: Option[String],
    posted_date: Option[Date],
    tags: Option[Seq[String]],
    job_url: Option[String],
    extracted_date: Option[Date],
    last_seen_date: Option[Date],
    extracted_ts: Option[Timestamp],
    date_id: Option[Long])
