"""Endpoint-parity facade: every reference API surface as one Python call.

The reference is ~21 Express routes over Drizzle/Postgres
(render-complete-deploy.js:343-878).  This module re-expresses that whole
user-facing surface on the engine, so a user of the reference can switch
and run every query they run today:

==========================================================  ==============================
reference route (render-complete-deploy.js)                 RehiveAPI method
==========================================================  ==============================
GET  /api/users/me · /api/users/:id          (:343, :366)   get_user
GET  /api/users/:id/referrals                (:384)         get_user_referrals
GET  /api/packages                           (:403)         get_packages
POST /api/gift-codes                         (:415)         create_gift_code
GET  /api/gift-codes/:userId                 (:438)         get_gift_codes
POST /api/redeem-gift-code                   (:456)         redeem_gift_code
GET  /api/commission-history/:userId         (:510)         get_commission_history
POST /api/commission-withdrawals             (:525)         request_withdrawal
GET  /api/commission-withdrawals             (:562)         get_withdrawals
GET  /api/subscription/status                (:582)         get_subscription_status
POST /api/subscription/pay                   (:612)         pay_subscription
GET  /api/subscription/payments              (:642)         get_subscription_payments
GET  /api/notifications/:userId              (:662)         get_notifications
PATCH /api/notifications/:id/read            (:677)         mark_notification_read
GET  /api/admin/commission-withdrawals       (:691)         admin_withdrawals
PATCH /api/admin/commission-withdrawals/:id  (:705)         process_withdrawal
GET  /api/admin/subscription-payments        (:753)         admin_subscription_payments
PATCH .../subscription-payments/:id/approve  (:767)         approve_subscription_payment
PATCH .../subscription-payments/:id/reject   (:811)         reject_subscription_payment
POST /api/admin/add-commission               (:846)         add_commission
==========================================================  ==============================

(HTTP/session/auth/static-file plumbing — :147-195, :319-340, :881 — is a
non-goal per SURVEY.md §7; ``isFounder`` is the caller's concern.)

Semantics are the engine's event-sourced translation (SURVEY.md §0):

- every reference UPDATE becomes an append to a fact/decision log;
- every mutable field is derived by a view at read time:
  ``commission_balance`` = Σ ledger − Σ approved withdrawals,
  ``is_redeemed`` = accepted-redemption-exists,
  withdrawal/payment ``status`` = latest decision wins,
  ``is_read`` = read-event-exists,
  subscription fields = latest approved payment wins;
- ``redeem_gift_code`` runs the full set-at-a-time commission pipeline
  (pipelines/redemption.py) on the single event against current state —
  the request-shaped twin of the bulk batch job, so sequential semantics
  (second redemption of a code rejects, balance visibility) hold exactly
  as in the reference's autocommit-per-request model.

Error parity: reference 4xx responses surface as :class:`ApiError` with
the same status code and message.

Determinism contract (SURVEY.md §2.12): no wall-clock — every write takes
an explicit ``ts``; ``as_of`` is fixed at construction; generated ids are
``max(existing)+sequence`` over a declared order (the io.append_returning
contract); gift codes derive from a seed, never ``rand()``.

Scale note: this facade is the REQUEST-shaped surface — per-write
driver-side max-id lookups and single-event pipeline runs, exactly the
reference's per-request cost model.  Bulk ingestion goes through
``pipelines.redemption.process_redemptions`` / ``io.append_facts``
unchanged; reads here are the same view definitions that back the declared
analytic queries, so they scale with the views (dimension joins broadcast,
facts aggregate once per key).
"""

from __future__ import annotations

from collections.abc import Sequence
from decimal import Decimal

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from r_e_hive__spark.functions.scalar import (
    add_one_month,
    capitalize,
    gift_code,
)
from r_e_hive__spark.operators.relational import latest_record_wins
from r_e_hive__spark.pipelines import views
from r_e_hive__spark.pipelines.redemption import process_redemptions
from r_e_hive__spark.schemas import REHIVE_SCHEMAS

# event-sourced decision/read logs (the engine-side twins of the
# reference's UPDATE statements)
_LOG_SCHEMAS: dict[str, StructType] = {
    # PATCH /api/admin/commission-withdrawals/:id (:722-737).  ``seq`` is
    # the log's own append sequence — the unique latest-wins tiebreaker
    # when two decisions share one processed_at (determinism contract).
    "withdrawal_decisions": StructType(
        [
            StructField("withdrawal_id", LongType(), False),
            StructField("status", StringType(), False),
            StructField("admin_notes", StringType(), True),
            StructField("processed_at", TimestampType(), False),
            StructField("seq", LongType(), False),
        ]
    ),
    # PATCH /api/admin/subscription-payments/:id/{approve,reject} (:779-795, :824-830)
    "payment_decisions": StructType(
        [
            StructField("payment_id", LongType(), False),
            StructField("status", StringType(), False),
            StructField("admin_notes", StringType(), True),
            StructField("processed_at", TimestampType(), False),
            StructField("seq", LongType(), False),
        ]
    ),
    # PATCH /api/notifications/:id/read (:679-682)
    "notification_reads": StructType(
        [
            StructField("notification_id", LongType(), False),
            StructField("read_at", TimestampType(), False),
        ]
    ),
    # accepted redemption facts (drives is_redeemed + users.package_id,
    # :476-486)
    "redemptions_accepted": StructType(
        [
            StructField("event_id", LongType(), False),
            StructField("gift_code_id", LongType(), False),
            StructField("code", StringType(), False),
            StructField("user_id", StringType(), False),
            StructField("package_id", LongType(), False),
            StructField("event_ts", TimestampType(), False),
        ]
    ),
}


class ApiError(Exception):
    """Reference 4xx parity: ``status`` + the reference's message text."""

    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


class RehiveAPI:
    """The reference's complete endpoint surface over event-sourced state.

    ``tables``: the nine reference tables as DataFrames (missing ones
    default to empty frames of the declared schema).  All state lives in
    in-session DataFrames; writes append (unionByName) — production
    deployments point the same logic at parquet fact tables via
    ``io.append_facts`` / ``io.append_returning``.
    """

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame],
        as_of: str,
    ):
        self.spark = spark
        self.as_of = as_of
        self.t: dict[str, DataFrame] = {}
        for name, schema in REHIVE_SCHEMAS.items():
            if name == "redemption_events":
                continue  # API-internal: redeem() builds events itself
            self.t[name] = tables.get(
                name, spark.createDataFrame([], schema)
            )
        for name, schema in _LOG_SCHEMAS.items():
            self.t[name] = tables.get(name, spark.createDataFrame([], schema))

    @classmethod
    def from_fixtures(cls, spark: SparkSession, as_of: str | None = None) -> "RehiveAPI":
        from r_e_hive__spark import fixtures

        frames = fixtures.fixture_frames(spark)
        return cls(spark, frames, as_of or str(fixtures.AS_OF_DT))

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _append(self, name: str, rows: DataFrame) -> None:
        self.t[name] = self.t[name].unionByName(rows)

    def _next_id(self, name: str, id_col: str = "id") -> int:
        """max(id)+1 — the single-row RETURNING lookup (io.append_returning
        contract; one scalar job per request-shaped write)."""
        cur = self.t[name].agg(F.max(id_col)).collect()[0][0]
        return int(cur or 0) + 1

    def _row(self, table: str, **values) -> DataFrame:
        """One literal row in ``table``'s declared schema (unset nullable
        fields → NULL)."""
        schema = REHIVE_SCHEMAS.get(table) or _LOG_SCHEMAS[table]
        data = [tuple(values.get(f.name) for f in schema.fields)]
        return self.spark.createDataFrame(data, schema)

    def _first(self, df: DataFrame):
        rows = df.limit(1).collect()
        return rows[0] if rows else None

    # ------------------------------------------------------------------
    # derived current-state views (S5: every reference UPDATE, as a view)
    # ------------------------------------------------------------------

    def gift_codes_current(self) -> DataFrame:
        """gift_codes with is_redeemed/redeemed_by/redeemed_at derived from
        accepted-redemption facts (:476-482's UPDATE, as a view).  Codes
        already marked redeemed in the base table stay redeemed."""
        base = self.t["gift_codes"]
        cur = views.gift_codes_current(
            base,
            self.t["redemptions_accepted"].select(
                "code", "user_id", F.col("event_ts"), "event_id"
            ),
        )
        # a base-table redemption (imported state) wins over "no event"
        b = base.select(
            "id",
            F.col("is_redeemed").alias("_b_red"),
            F.col("redeemed_by").alias("_b_by"),
            F.col("redeemed_at").alias("_b_at"),
        )
        return (
            cur.join(b, "id")
            .withColumn("is_redeemed", F.col("is_redeemed") | F.col("_b_red"))
            .withColumn("redeemed_by", F.coalesce(F.col("redeemed_by"), F.col("_b_by")))
            .withColumn("redeemed_at", F.coalesce(F.col("redeemed_at"), F.col("_b_at")))
            .drop("_b_red", "_b_by", "_b_at")
        )

    def withdrawals_current(self) -> DataFrame:
        """commission_withdrawals with latest decision applied (:722-737's
        UPDATE, as a view)."""
        return self._with_decisions(
            "commission_withdrawals", "withdrawal_decisions", "withdrawal_id"
        )

    def subscription_payments_current(self) -> DataFrame:
        """subscription_payments with latest decision applied (:779-795 /
        :824-830's UPDATEs, as a view)."""
        return self._with_decisions(
            "subscription_payments", "payment_decisions", "payment_id"
        )

    def _with_decisions(self, base: str, log: str, fk: str) -> DataFrame:
        d = latest_record_wins(
            self.t[log], [fk], [F.desc("processed_at"), F.desc("seq")]
        ).select(
            F.col(fk).alias("id"),
            F.col("status").alias("_d_status"),
            F.col("admin_notes").alias("_d_notes"),
            F.col("processed_at").alias("_d_at"),
        )
        return (
            self.t[base]
            .join(d, "id", "left")
            .withColumn("status", F.coalesce(F.col("_d_status"), F.col("status")))
            .withColumn(
                "admin_notes", F.coalesce(F.col("_d_notes"), F.col("admin_notes"))
            )
            .withColumn(
                "processed_at", F.coalesce(F.col("_d_at"), F.col("processed_at"))
            )
            .drop("_d_status", "_d_notes", "_d_at")
        )

    def notifications_current(self) -> DataFrame:
        """notifications with is_read derived from the read-event log
        (:679-682's UPDATE, as a view)."""
        reads = self.t["notification_reads"].select(
            F.col("notification_id").alias("id"), F.lit(True).alias("_read_ev")
        ).dropDuplicates(["id"])
        return (
            self.t["notifications"]
            .join(reads, "id", "left")
            .withColumn(
                "is_read", F.col("is_read") | F.coalesce(F.col("_read_ev"), F.lit(False))
            )
            .drop("_read_ev")
        )

    def users_current(self) -> DataFrame:
        """users + every derived mutable field: commission_balance (Σ
        ledger − Σ approved withdrawals), package_id (latest accepted
        redemption wins), subscription status/expiry/last-payment (latest
        approved subscription payment wins, +1 month — :779-795)."""
        approvals = (
            self.t["subscription_payments"]
            .select("id", "user_id")
            .join(
                self.t["payment_decisions"].where(F.col("status") == "approved"),
                F.col("id") == F.col("payment_id"),
            )
            .select("user_id", "processed_at", "seq")
        )
        latest_appr = latest_record_wins(
            approvals, ["user_id"], [F.desc("processed_at"), F.desc("seq")]
        ).select(
            F.col("user_id").alias("_au"), F.col("processed_at").alias("_appr_at")
        )
        users = (
            self.t["users"]
            .join(latest_appr, F.col("id") == F.col("_au"), "left")
            .withColumn(
                "subscription_expires_at",
                F.coalesce(add_one_month(F.col("_appr_at")),
                           F.col("subscription_expires_at")),
            )
            .withColumn(
                "last_subscription_payment",
                F.coalesce(F.col("_appr_at"), F.col("last_subscription_payment")),
            )
            .drop("_au", "_appr_at")
        )
        return views.users_current(
            users,
            self.t["commissions"],
            self.withdrawals_current(),
            self.as_of,
            accepted_redemptions=self.t["redemptions_accepted"].select(
                "user_id", "package_id", "event_ts", "event_id"
            ),
        )

    def _with_package(self, df: DataFrame, on: str = "package_id") -> DataFrame:
        """Drizzle's ``with: {package: true}`` relation load: broadcast
        left join, package columns prefixed ``package_`` (J1).  The
        caller's FK column keeps its name; the package's own ``id`` is
        dropped after the join (it equals the FK wherever matched)."""
        pkg = self.t["packages"].select(
            F.col("id").alias("__pkg_id"),
            *[
                F.col(c).alias(f"package_{c}")
                for c in self.t["packages"].columns
                if c != "id"
            ],
        )
        return df.join(F.broadcast(pkg), df[on] == pkg["__pkg_id"], "left").drop(
            "__pkg_id"
        )

    # ------------------------------------------------------------------
    # generic Drizzle-shaped relational builder (SURVEY.md §3.1: "the API
    # stays DataFrame-builder-shaped (like Drizzle) plus raw SQL")
    # ------------------------------------------------------------------

    # relation registry mirroring the reference's Drizzle `relations`
    # declarations: relation name -> (target table, fk on source, pk)
    _RELATIONS: dict[tuple[str, str], tuple[str, str, str]] = {
        ("users", "package"): ("packages", "package_id", "id"),
        ("referrals", "referred"): ("users", "referred_id", "id"),
        ("referrals", "referrer"): ("users", "referrer_id", "id"),
        ("gift_codes", "package"): ("packages", "package_id", "id"),
        ("gift_codes", "redeemer"): ("users", "redeemed_by", "id"),
        ("commissions", "user"): ("users", "user_id", "id"),
        ("commission_withdrawals", "user"): ("users", "user_id", "id"),
        ("subscription_payments", "user"): ("users", "user_id", "id"),
        ("notifications", "user"): ("users", "user_id", "id"),
    }

    def current(self, table: str) -> DataFrame:
        """The table's CURRENT view — derived state where the reference
        mutates in place, the raw frame elsewhere."""
        views_ = {
            "users": self.users_current,
            "gift_codes": self.gift_codes_current,
            "commission_withdrawals": self.withdrawals_current,
            "subscription_payments": self.subscription_payments_current,
            "notifications": self.notifications_current,
        }
        if table in views_:
            return views_[table]()
        if table not in self.t:
            raise ApiError(404, f"Unknown table {table!r}")
        return self.t[table]

    def find_many(
        self,
        table: str,
        where: dict | Column | None = None,
        order_by: Sequence[tuple[str, str] | str] = (),
        limit: int | None = None,
        with_: dict | None = None,
    ) -> DataFrame:
        """Drizzle's ``db.query.<t>.findMany({where, with, orderBy,
        limit})`` shape (e.g. render-complete-deploy.js:386-394).

        ``where``: {col: value} equality conjunction (eq/and — the only
        predicates the reference builds) or a raw Column for anything
        richer.  ``with_``: {relation: True | nested dict} relation loads
        from the registry; loaded columns arrive prefixed ``{rel}_``,
        nested loads compose prefixes (``referred_package_price``).
        Everything compiles to the same broadcast-left-join + filter +
        TakeOrderedAndProject plans as the named endpoints."""
        df = self.current(table)
        for rel, spec in (with_ or {}).items():
            key = (table, rel)
            if key not in self._RELATIONS:
                raise ApiError(400, f"Unknown relation {rel!r} on {table!r}")
            target, fk, pk = self._RELATIONS[key]
            if isinstance(spec, dict):  # nested relation load (J2 shape)
                inner = self.find_many(target, with_=spec)
            else:
                inner = self.current(target)
            aliased = inner.select(
                *[F.col(c).alias(f"{rel}_{c}") for c in inner.columns]
            )
            side = (
                F.broadcast(aliased) if target == "packages" else aliased
            )
            # drop by Column reference, not name: for the `user` relation
            # the aliased pk is literally "user_id" — a name-based drop
            # would also delete the source fk column
            df = df.join(
                side, df[fk] == aliased[f"{rel}_{pk}"], "left"
            ).drop(aliased[f"{rel}_{pk}"])
        if isinstance(where, dict):
            for c, v in where.items():
                df = df.where(F.col(c).eqNullSafe(F.lit(v)))
        elif where is not None:
            df = df.where(where)
        if order_by:
            exprs = []
            for o in order_by:
                if isinstance(o, str):
                    exprs.append(F.asc(o))
                else:
                    c, d = o
                    exprs.append(F.desc(c) if d.lower() == "desc" else F.asc(c))
            df = df.orderBy(*exprs)
        if limit is not None:
            df = df.limit(limit)
        return df

    def find_first(self, table: str, **kwargs) -> DataFrame:
        """Drizzle ``findFirst`` — LIMIT 1 (S2 point-lookup shape)."""
        return self.find_many(table, **kwargs).limit(1)

    def insert(self, table: str, values: dict) -> DataFrame:
        """Generic ``db.insert(t).values({...}).returning()`` (S4).

        Serial (long) pks auto-assign ``max(existing)+1``; the uuid-pk
        ``users`` table requires a caller-supplied ``id`` — the engine
        never draws random uuids on a hash-checked path (F15), exactly as
        fixtures pre-generate them.  A supplied ``id`` always wins."""
        if table not in REHIVE_SCHEMAS or table == "redemption_events":
            raise ApiError(400, f"Cannot insert into {table!r}")
        vals = dict(values)
        if "id" not in vals:
            pk_type = REHIVE_SCHEMAS[table]["id"].dataType
            if isinstance(pk_type, LongType):
                vals["id"] = self._next_id(table)
            else:
                raise ApiError(
                    400,
                    f"{table!r} has a non-serial pk: supply an explicit id "
                    "(F15 — ids come from data, never rand/uuid)",
                )
        row = self._row(table, **vals)
        self._append(table, row)
        return row

    def sql(self, query: str) -> DataFrame:
        """Raw-SQL escape hatch (F17): every table's CURRENT view is
        registered as ``api_<table>`` before the query runs, so the
        event-sourced derivations are visible to plain Spark SQL."""
        for name in REHIVE_SCHEMAS:
            if name == "redemption_events":
                continue
            self.current(name).createOrReplaceTempView(f"api_{name}")
        return self.spark.sql(query)

    # ------------------------------------------------------------------
    # read endpoints
    # ------------------------------------------------------------------

    def get_user(self, user_id: str) -> DataFrame:
        """GET /api/users/me · /api/users/:id (:343-382): user + package
        relation load.  404 if absent."""
        # materialize the derived-view row ONCE: the existence probe and
        # the caller's collect would otherwise each run the full
        # users_current plan (round-5 review)
        out = self._with_package(
            self.users_current().where(F.col("id") == F.lit(user_id))
        ).limit(1).localCheckpoint(eager=True)
        if self._first(out) is None:
            raise ApiError(404, "User not found")
        return out

    def get_user_referrals(self, user_id: str) -> DataFrame:
        """GET /api/users/:id/referrals (:384-401): 2-level relation load
        (referred user → package), newest first (J2)."""
        refs = self.t["referrals"].where(F.col("referrer_id") == F.lit(user_id))
        uc = self.users_current()
        referred = uc.select(
            *[F.col(c).alias(f"referred_user_{c}") for c in uc.columns]
        )
        joined = refs.join(
            referred, refs["referred_id"] == referred["referred_user_id"], "left"
        )
        out = self._with_package(joined, on="referred_user_package_id")
        return out.orderBy(F.desc("created_at"), F.desc("id"))

    def get_packages(self) -> DataFrame:
        """GET /api/packages (:403-413): all packages by ascending price
        (O2; id tiebreak for determinism)."""
        return self.t["packages"].orderBy(F.asc("price"), F.asc("id"))

    def get_gift_codes(self, user_id: str) -> DataFrame:
        """GET /api/gift-codes/:userId (:438-454): creator's codes with
        package + redeemer relation loads, newest first (J3)."""
        codes = self.gift_codes_current().where(
            F.col("created_by") == F.lit(user_id)
        )
        redeemer = self.t["users"].select(
            F.col("id").alias("_rid"),
            F.col("full_name").alias("redeemer_full_name"),
            F.col("email").alias("redeemer_email"),
        )
        out = self._with_package(codes).join(
            redeemer, codes["redeemed_by"] == redeemer["_rid"], "left"
        ).drop("_rid")
        return out.orderBy(F.desc("created_at"), F.desc("id"))

    def get_commission_history(self, user_id: str, limit: int = 100) -> DataFrame:
        """GET /api/commission-history/:userId (:510-523): latest
        ``limit`` ledger rows (W1 shape; id tiebreak)."""
        return (
            self.t["commissions"]
            .where(F.col("user_id") == F.lit(user_id))
            .orderBy(F.desc("created_at"), F.desc("id"))
            .limit(limit)
        )

    def get_withdrawals(self, user_id: str) -> DataFrame:
        """GET /api/commission-withdrawals?userId= (:562-580)."""
        return (
            self.withdrawals_current()
            .where(F.col("user_id") == F.lit(user_id))
            .orderBy(F.desc("created_at"), F.desc("id"))
        )

    def get_subscription_status(self, user_id: str) -> DataFrame:
        """GET /api/subscription/status?userId= (:582-610): the derived
        {status, expires_at, last_payment} projection (P7/F11 vs as_of)."""
        # single execution for probe + result (round-5 review)
        u = (
            self.users_current()
            .where(F.col("id") == F.lit(user_id))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        if self._first(u.select("id")) is None:
            raise ApiError(404, "User not found")
        return u.select(
            F.col("subscription_status").alias("status"),
            F.col("subscription_expires_at").alias("expires_at"),
            F.col("last_subscription_payment").alias("last_payment"),
        )

    def get_subscription_payments(self, user_id: str) -> DataFrame:
        """GET /api/subscription/payments?userId= (:642-660)."""
        return (
            self.subscription_payments_current()
            .where(F.col("user_id") == F.lit(user_id))
            .orderBy(F.desc("created_at"), F.desc("id"))
        )

    def get_notifications(self, user_id: str, limit: int = 50) -> DataFrame:
        """GET /api/notifications/:userId (:662-675): latest ``limit``."""
        return (
            self.notifications_current()
            .where(F.col("user_id") == F.lit(user_id))
            .orderBy(F.desc("created_at"), F.desc("id"))
            .limit(limit)
        )

    def admin_withdrawals(self) -> DataFrame:
        """GET /api/admin/commission-withdrawals (:691-703): all
        withdrawals with the user relation load (J4)."""
        return self._admin_list(self.withdrawals_current())

    def admin_subscription_payments(self) -> DataFrame:
        """GET /api/admin/subscription-payments (:753-765)."""
        return self._admin_list(self.subscription_payments_current())

    def _admin_list(self, facts: DataFrame) -> DataFrame:
        u = self.t["users"].select(
            F.col("id").alias("_uid"),
            F.col("full_name").alias("user_full_name"),
            F.col("email").alias("user_email"),
        )
        return (
            facts.join(u, facts["user_id"] == u["_uid"], "left")
            .drop("_uid")
            .orderBy(F.desc("created_at"), F.desc("id"))
        )

    # ------------------------------------------------------------------
    # write endpoints (append events; views derive)
    # ------------------------------------------------------------------

    def create_gift_code(self, package_id: int, user_id: str, ts) -> DataFrame:
        """POST /api/gift-codes (:415-436): deterministic code (F7 — the
        engine's seeded reformulation of generateGiftCode :198-205),
        insert-RETURNING."""
        new_id = self._next_id("gift_codes")
        row = self._row(
            "gift_codes",
            id=new_id,
            code="",  # assigned below from the seed
            package_id=int(package_id),
            created_by=user_id,
            is_redeemed=False,
            created_at=ts,
        ).withColumn(
            "code",
            gift_code(F.concat_ws("|", F.lit(user_id), F.lit(new_id), F.col("created_at"))),
        )
        row = row.localCheckpoint(eager=True)  # pin the generated row
        self._append("gift_codes", row)
        return row

    def redeem_gift_code(
        self, code: str, user_id: str, ts, referral_code: str | None = None
    ) -> dict:
        """POST /api/redeem-gift-code (:456-508): the full commission
        pipeline on one event against current state.  Raises the
        reference's 404 (invalid/redeemed code) / 400 (self-redemption)."""
        event_id = self._next_id("redemptions_accepted", "event_id")
        event = self.spark.createDataFrame(
            [(event_id, code, user_id, referral_code, ts)],
            REHIVE_SCHEMAS["redemption_events"],
        )
        out = process_redemptions(
            event,
            self.gift_codes_current(),
            self.users_current(),
            self.t["packages"],
            self.t["referrals"],
        )
        rej = self._first(out.rejected)
        if rej is not None:
            if rej["reject_reason"] == "self_redemption":
                raise ApiError(400, "Cannot redeem your own gift code")
            raise ApiError(404, "Invalid or already redeemed gift code")

        accepted = self._first(out.accepted)
        if accepted is None:
            # the code points at a nonexistent package: the reference still
            # redeems the code and re-points the user (:476-486) but
            # processCommissions early-returns (:214 `if (!packageData)
            # return`) — no ledger/notifications/profit.  The pipeline's
            # package inner-join dropped the event, so replay just the
            # redemption fact here.
            gc = self._first(
                self.gift_codes_current().where(F.col("code") == F.lit(code))
            )
            self._append(
                "redemptions_accepted",
                self._row(
                    "redemptions_accepted",
                    event_id=event_id,
                    gift_code_id=gc["id"],
                    code=code,
                    user_id=user_id,
                    package_id=gc["package_id"],
                    event_ts=ts,
                ),
            )
            return {"message": "Gift code redeemed successfully"}
        self._append(
            "redemptions_accepted",
            self._row(
                "redemptions_accepted",
                event_id=event_id,
                gift_code_id=accepted["gift_code_id"],
                code=code,
                user_id=user_id,
                package_id=accepted["package_id"],
                event_ts=ts,
            ),
        )
        # referral edge (:494-497).  Parity note: the engine keeps AT MOST
        # ONE inbound edge per user (the pipeline's pinned deterministic
        # semantic — the reference inserts unconditionally but its upline
        # walk reads only findFirst's single edge, :263-267, so extra
        # edges are unreachable state there; here they are simply not
        # written, keeping get_user_referrals consistent with what the
        # commission engine actually pays through).
        ref_base = self._next_id("referrals") - 1
        self._seq_append(
            "referrals",
            out.new_referrals.select("referrer_id", "referred_id", "created_at"),
            ref_base,
            [F.asc("referred_id")],
        )
        # ledger (:218-224, :277-283)
        led_base = self._next_id("commissions") - 1
        self._seq_append(
            "commissions",
            out.commission_ledger.select(
                "user_id", "amount", "type", "source_user_id", "gift_code_id",
                "created_at",
            ),
            led_base,
            [F.asc("level"), F.asc("user_id")],
            order_source=out.commission_ledger,
        )
        # notifications (:234-239, :291-295)
        notif_base = self._next_id("notifications") - 1
        self._seq_append(
            "notifications",
            out.notifications,
            notif_base,
            [F.asc("user_id"), F.asc("message")],
        )
        # company profit (:303-311)
        prof_base = self._next_id("company_profits") - 1
        self._seq_append(
            "company_profits",
            out.company_profits.select(
                "amount", "source_type", "source_id", "commission_paid",
                "is_withdrawn", "created_at",
            ),
            prof_base,
            [F.asc("source_id")],
        )
        return {"message": "Gift code redeemed successfully"}

    def _seq_append(
        self, table: str, rows: DataFrame, base: int, order, order_source=None
    ) -> DataFrame:
        """Append ``rows`` with ids base+1.. over a declared order (the
        append_returning id rule); single-event batches are tiny, so the
        single-window path applies.  Returns the appended frame."""
        from r_e_hive__spark.io import sequence_ids

        src = order_source if order_source is not None else rows
        with_id = (
            sequence_ids(src, order, out_col="_seq", distributed=False)
            .withColumn("id", (F.lit(base) + F.col("_seq")).cast("long"))
            .drop("_seq")
        )
        keep = ["id", *rows.columns]
        schema = REHIVE_SCHEMAS[table]
        aligned = with_id.select(
            *[
                (F.col(f.name) if f.name in keep else F.lit(None))
                .cast(f.dataType)
                .alias(f.name)
                for f in schema.fields
            ]
        ).localCheckpoint(eager=True)  # pin before state mutation
        self._append(table, aligned)
        return aligned

    def request_withdrawal(
        self,
        user_id: str,
        amount,
        ts,
        payment_method: str | None = None,
        payment_details: str | None = None,
    ) -> DataFrame:
        """POST /api/commission-withdrawals (:525-560): balance-sufficiency
        guard against the DERIVED balance, then insert-RETURNING a pending
        request.  400 on insufficient balance, 404 on unknown user."""
        u = self._first(
            self.users_current()
            .where(F.col("id") == F.lit(user_id))
            .select("commission_balance")
        )
        if u is None:
            raise ApiError(404, "User not found")
        if u["commission_balance"] < Decimal(str(amount)):
            raise ApiError(400, "Insufficient commission balance")
        row = self._row(
            "commission_withdrawals",
            id=self._next_id("commission_withdrawals"),
            user_id=user_id,
            amount=Decimal(str(amount)).quantize(Decimal("0.01")),
            status="pending",
            payment_method=payment_method or "bank_transfer",  # :551 default
            payment_details=payment_details,
            created_at=ts,
        )
        self._append("commission_withdrawals", row)
        return row

    def process_withdrawal(
        self, withdrawal_id: int, status: str, ts, admin_notes: str | None = None
    ) -> dict:
        """PATCH /api/admin/commission-withdrawals/:id (:705-751): append a
        decision event; the balance debit and status are views.  400 on a
        status outside {approved, rejected}; 404 on unknown id."""
        if status not in ("approved", "rejected"):
            raise ApiError(400, "Invalid status")
        w = self._first(
            self.withdrawals_current().where(F.col("id") == F.lit(int(withdrawal_id)))
        )
        if w is None:
            raise ApiError(404, "Withdrawal not found")
        self._append(
            "withdrawal_decisions",
            self._row(
                "withdrawal_decisions",
                withdrawal_id=int(withdrawal_id),
                status=status,
                admin_notes=admin_notes,
                processed_at=ts,
                seq=self._next_id("withdrawal_decisions", "seq"),
            ),
        )
        # message parity with the JS template literal (:742): the raw
        # canonical 2-dp amount, no thousands separators
        self._notify(
            w["user_id"],
            title_expr=F.concat(F.lit("Withdrawal "), capitalize(F.lit(status))),
            message_expr=F.lit(
                f"Your withdrawal request for ${w['amount']} has been {status}"
            ),
            type_="withdrawal",
            ts=ts,
        )
        return {"message": f"Withdrawal {status} successfully"}

    def pay_subscription(self, user_id: str, ts, proof_url: str | None = None) -> DataFrame:
        """POST /api/subscription/pay (:612-640): $50.00 pending payment +
        submission notification, insert-RETURNING."""
        row = self._row(
            "subscription_payments",
            id=self._next_id("subscription_payments"),
            user_id=user_id,
            amount=Decimal("50.00"),  # :623 fixed fee
            payment_proof_url=proof_url,
            status="pending",
            created_at=ts,
        )
        self._append("subscription_payments", row)
        self._notify(
            user_id,
            title_expr=F.lit("Subscription Payment Submitted"),
            message_expr=F.lit(
                "Your subscription payment has been submitted for review"
            ),
            type_="payment",
            ts=ts,
        )
        return row

    def approve_subscription_payment(self, payment_id: int, ts) -> dict:
        """PATCH /api/admin/subscription-payments/:id/approve (:767-809):
        decision event; subscription activation (+1 month) is a view."""
        return self._decide_payment(payment_id, "approved", ts, None,
                                    "Subscription Activated",
                                    "Your subscription payment has been approved "
                                    "and your subscription is now active",
                                    "subscription")

    def reject_subscription_payment(
        self, payment_id: int, ts, admin_notes: str | None = None
    ) -> dict:
        """PATCH /api/admin/subscription-payments/:id/reject (:811-844)."""
        msg = (
            f"Your subscription payment has been rejected. "
            f"{admin_notes or 'Please contact support for more information.'}"
        )
        return self._decide_payment(
            payment_id, "rejected", ts, admin_notes,
            "Subscription Payment Rejected", msg, "subscription",
        )

    def _decide_payment(self, payment_id, status, ts, notes, title, msg, typ) -> dict:
        p = self._first(
            self.t["subscription_payments"].where(F.col("id") == F.lit(int(payment_id)))
        )
        if p is None:
            raise ApiError(404, "Payment not found")
        self._append(
            "payment_decisions",
            self._row(
                "payment_decisions",
                payment_id=int(payment_id),
                status=status,
                admin_notes=notes,
                processed_at=ts,
                seq=self._next_id("payment_decisions", "seq"),
            ),
        )
        self._notify(p["user_id"], F.lit(title), F.lit(msg), typ, ts)
        return {"message": f"Subscription payment {status}"}

    def add_commission(
        self, user_id: str, amount, type_: str, ts, description: str | None = None
    ) -> dict:
        """POST /api/admin/add-commission (:846-878): append a ledger row;
        balance is the view."""
        amt = Decimal(str(amount)).quantize(Decimal("0.01"))
        self._append(
            "commissions",
            self._row(
                "commissions",
                id=self._next_id("commissions"),
                user_id=user_id,
                amount=amt,
                type=type_,
                created_at=ts,
            ),
        )
        # :869 template literal parity: the RAW request amount (the ledger
        # row carries the quantized decimal, the message shows what the
        # caller sent, exactly as the JS interpolates req.body.amount);
        # trailing space survives an absent description as in JS
        self._notify(
            user_id,
            title_expr=F.lit("Commission Added"),
            message_expr=F.lit(
                f"${amount} {type_} commission has been added to your account. "
                f"{description or ''}"
            ),
            type_="commission",
            ts=ts,
        )
        return {"message": "Commission added successfully"}

    def mark_notification_read(self, notification_id: int, ts) -> dict:
        """PATCH /api/notifications/:id/read (:677-689): a read event; the
        flag is a view."""
        self._append(
            "notification_reads",
            self._row(
                "notification_reads",
                notification_id=int(notification_id),
                read_at=ts,
            ),
        )
        return {"message": "Notification marked as read"}

    def _notify(self, user_id, title_expr, message_expr, type_, ts) -> None:
        """Append one notification row (the reference's synchronous fan-out
        insert, :234-239 et al.)."""
        row = (
            self._row(
                "notifications",
                id=self._next_id("notifications"),
                user_id=user_id,
                title="",
                message="",
                type=type_,
                is_read=False,
                created_at=ts,
            )
            .withColumn("title", title_expr)
            .withColumn("message", message_expr)
            .localCheckpoint(eager=True)
        )
        self._append("notifications", row)
