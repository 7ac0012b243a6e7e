"""Joomla→WordPress migration replayed as a golden e2e.

Second CMS use case after Drupal2WP (``test_drupal2wp_golden.py``),
reproducing the reference's ``usecases/databases/Joomla2WP.scala``
"migrating joomla_users to wp_users with aggregated mappings" leg:

- the *actual reference DFASDL files*
  (``src/it/resources/usecases/databases/joomla2wp/…``) compile through
  :mod:`tensei_agent_spark.plans.dfasdl`;
- the cookbook translates mapping-for-mapping — including the
  AGGREGATED MapOneToOne mapping (five source refs → five targets in
  one MappingTransformation) and the ``IfThenElseNumeric`` id rebase
  (``x>0 → x=x-819``), a transformer mix Drupal2WP does not exercise;
- source and target are LIVE embedded Derby;
- the assertions are the reference's own golden values
  (``Joomla2WP.scala:226-244``).
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from tensei_agent_spark.plans import ColumnRef, Mapping, Pipeline, Recipe, run_pipeline
from tensei_agent_spark.plans.dfasdl import source_spec, target_spec
from tensei_agent_spark.plans.spec import SourceSpec
from tensei_agent_spark.sinks.jdbc import jvm_execute
from tensei_agent_spark.sources import read_source

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
RES = "/root/reference/src/it/resources/usecases/databases/joomla2wp"

requires_fixtures = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixture corpus not present"
)


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby_joomla")
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(home))
    return f"jdbc:derby:{home}/joomla;create=true"


def _dfasdl(name: str) -> str:
    with open(f"{RES}/joomla2wp-j3_43-wp4_22-{name}.xml", encoding="utf-8") as fh:
        return fh.read()


# Source rows from Joomla2WP.scala:85-109 (H2 int(11)/tinyint(4)/text
# become Derby-legal types — dialect scaffolding, not the semantics
# under test).
USERS_DDL = [
    "CREATE TABLE joomla_users (id INTEGER, name VARCHAR(255),"
    " username VARCHAR(150), email VARCHAR(100), password VARCHAR(100),"
    " block SMALLINT, sendemail SMALLINT, registerdate TIMESTAMP,"
    " lastvisitdate TIMESTAMP, activation VARCHAR(100),"
    " params VARCHAR(2000), lastresettime TIMESTAMP, resetcount INTEGER,"
    " otpkey VARCHAR(1000), otep VARCHAR(1000), requirereset SMALLINT)",
    "INSERT INTO joomla_users VALUES (820, 'Super User', 'chris',"
    " 'christian@wegtam.de', '$2y$10$T.vT9e.Dyy48PDJgSNZ58euuP2slrtZlPImoHQ1aFl6kXIhm/4X/a',"
    " 0, 1, '2015-07-07 10:01:57', '2015-09-02 11:15:14', '0', '',"
    " '1970-01-01 00:00:00', 0, '', '', 0)",
    "INSERT INTO joomla_users VALUES (821, 'user2', 'user2',"
    " 'christian2@wegtam.com', '$2y$10$yEMWUofveEhmJnhFwHYnWuB8Z/C15sgS6i7MG3tTt9F6nvKUA4o/e',"
    " 0, 0, '2015-07-08 09:07:25', '2015-07-21 10:54:40', '',"
    " '{\"admin_style\":\"\"}', '1970-01-01 00:00:00', 0, '', '', 0)",
    "INSERT INTO joomla_users VALUES (822, 'user3', 'user3',"
    " 'christian3@wegtam.com', '$2y$10$TZkTaB4XWNbzeAJKkecFHur656fepcs5KeE3z9K7jhu0CBmU.Mf3i',"
    " 0, 0, '2015-07-08 09:07:55', '2015-07-08 09:18:16', '',"
    " '{\"admin_style\":\"\"}', '1970-01-01 00:00:00', 0, '', '', 0)",
]


def _users_pipeline(derby_url):
    src = source_spec(
        _dfasdl("source-joomla_users"), "joomla_users", derby_url, fmt="jdbc",
        seq_id="joomla_users",
    )
    src.options.update({"driver": DRIVER, "table": "JOOMLA_USERS"})
    tgt = target_spec(
        _dfasdl("target-wp_users"), "wp_users", derby_url, fmt="jdbc",
        seq_id="wp_users", mode="overwrite",
    )
    tgt.options.update({"driver": DRIVER, "table": "WP_USERS"})

    def ref(col):
        return ColumnRef("joomla_users", col)

    # ≙ Cookbook "Users" (Joomla2WP.scala:129-193), mapping for mapping.
    recipe = Recipe(
        "joomla-users", "wp_users",
        mappings=(
            # The AGGREGATED MapOneToOne mapping: five refs zip five
            # targets in ONE MappingTransformation, no transformers.
            Mapping(
                (ref("username"), ref("username"), ref("email"),
                 ref("registerdate"), ref("username")),
                ("user_login", "user_nicename", "user_email",
                 "user_registered", "display_name"),
            ),
            Mapping(
                (ref("id"),), ("id",),
                transformers=(
                    ("if_then_else_numeric",
                     {"condition": "x>0", "then": "x=x-819", "format": "num"}),
                ),
            ),
            Mapping(
                (ref("id"),) * 3,
                ("user_pass", "user_url", "user_activation_key"),
                transformers=(("empty_string", {}),),
            ),
            Mapping(
                (ref("id"),), ("user_status",),
                transformers=(("overwrite", {"value": "0", "type": "long"}),),
            ),
        ),
    )
    return Pipeline("joomla2wp-users", (src,), (tgt,), (recipe,))


@requires_fixtures
def test_joomla_users_to_wp_users_golden(spark, derby_url):
    jvm_execute(spark, derby_url, USERS_DDL, DRIVER)

    pipeline = _users_pipeline(derby_url)
    # Parser row count: 3 (Joomla2WP.scala:218-220).
    assert read_source(spark, pipeline.source("joomla_users")).count() == 3

    run_pipeline(spark, pipeline)

    back = read_source(
        spark,
        SourceSpec(
            "WP_USERS", "jdbc", derby_url,
            options={"driver": DRIVER, "table": "WP_USERS"},
        ),
    ).orderBy("id")
    rows = back.collect()

    # Golden values: Joomla2WP.scala:226-244 — ids rebased 820.. → 1..
    assert [r["id"] for r in rows] == [1, 2, 3]
    chris = rows[0]
    assert chris["user_login"] == "chris"
    assert chris["user_pass"] == ""
    assert chris["user_nicename"] == "chris"
    assert chris["user_email"] == "christian@wegtam.de"
    assert chris["user_url"] == ""
    assert chris["user_registered"] == datetime(2015, 7, 7, 10, 1, 57)
    assert chris["user_activation_key"] == ""
    assert chris["user_status"] == 0
    assert chris["display_name"] == "chris"


# --- jcomments → wp_comments --------------------------------------------------

# Source rows from Joomla2WP.scala:556-590.
COMMENT_BODY_5 = (
    '["quote name=Christian"]1. Kommentar 8)[/quote]<br />Antwortkommentar'
)
JCOMMENTS_DDL = [
    "CREATE TABLE joomla_jcomments (id INTEGER, parent INTEGER,"
    " thread_id INTEGER, path VARCHAR(255), \"LEVEL\" SMALLINT,"
    " object_id INTEGER, object_group VARCHAR(255),"
    " object_params VARCHAR(2000), lang VARCHAR(255), userid INTEGER,"
    " name VARCHAR(255), username VARCHAR(255), email VARCHAR(255),"
    " homepage VARCHAR(255), title VARCHAR(255), comment VARCHAR(2000),"
    " ip VARCHAR(39), \"DATE\" TIMESTAMP, isgood SMALLINT,"
    " ispoor SMALLINT, published SMALLINT, deleted SMALLINT,"
    " subscribe SMALLINT, source VARCHAR(255), source_id INTEGER,"
    " checked_out INTEGER, checked_out_time TIMESTAMP, editor VARCHAR(50))",
    "INSERT INTO joomla_jcomments VALUES (4, 0, 0, '0', 0, 2,"
    " 'com_content', '', 'en-GB', 0, 'Christian', 'Christian',"
    " 'christian@wegtam.com', '', '', '1. Kommentar 8)', '127.0.0.1',"
    " '2015-09-17 08:38:46', 0, 0, 1, 0, 0, '', 0, 0,"
    " '1970-01-01 00:00:00', '')",
    f"INSERT INTO joomla_jcomments VALUES (5, 0, 0, '0', 0, 2,"
    f" 'com_content', '', 'en-GB', 0, 'anderer Christian',"
    f" 'anderer Christian', 'christian7@wegtam.com', '', '',"
    f" '{COMMENT_BODY_5.replace(chr(39), chr(39) * 2)}', '127.0.0.1',"
    f" '2015-09-17 08:39:39', 0, 0, 1, 0, 0, '', 0, 0,"
    f" '1970-01-01 00:00:00', '')",
    "INSERT INTO joomla_jcomments VALUES (6, 0, 0, '0', 0, 2,"
    " 'com_content', '', 'en-GB', 0, 'Christian', 'Christian',"
    " 'christian@wegtam.com', '', '', '#3', '127.0.0.1',"
    " '2015-09-17 08:40:21', 0, 0, 1, 0, 0, '', 0, 0,"
    " '1970-01-01 00:00:00', '')",
    "INSERT INTO joomla_jcomments VALUES (7, 0, 0, '0', 0, 3,"
    " 'com_content', '', 'en-GB', 0, 'Christian', 'Christian',"
    " 'christian@wegtam.com', '', '', 'test', '127.0.0.1',"
    " '2015-09-17 09:10:53', 0, 0, 1, 0, 0, '', 0, 0,"
    " '1970-01-01 00:00:00', '')",
]


def _comments_pipeline(derby_url):
    src = source_spec(
        _dfasdl("source-joomla_comments"), "jcomments", derby_url, fmt="jdbc",
        seq_id="joomla_jcomments",
    )
    src.options.update({"driver": DRIVER, "table": "JOOMLA_JCOMMENTS"})
    tgt = target_spec(
        _dfasdl("target-wp_comments"), "wp_comments", derby_url, fmt="jdbc",
        seq_id="wp_comments", mode="overwrite",
    )
    tgt.options.update({"driver": DRIVER, "table": "WP_COMMENTS"})

    def ref(col):
        return ColumnRef("jcomments", col)

    # ≙ Cookbook "Comments" (Joomla2WP.scala:608-672), mapping for
    # mapping: one aggregated 12→12 MapOneToOne, EmptyString pair, and
    # IfThenElseNumeric WITH an else branch (userid 0 stays 0).
    recipe = Recipe(
        "joomla-comments", "wp_comments",
        mappings=(
            Mapping(
                (ref("id"), ref("object_id"), ref("name"), ref("email"),
                 ref("homepage"), ref("ip"), ref("date"), ref("date"),
                 ref("comment"), ref("isgood"), ref("published"),
                 ref("parent")),
                ("comment_id", "comment_post_id", "comment_author",
                 "comment_author_email", "comment_author_url",
                 "comment_author_ip", "comment_date", "comment_date_gmt",
                 "comment_content", "comment_karma", "comment_approved",
                 "comment_parent"),
            ),
            Mapping(
                (ref("id"),) * 2,
                ("comment_agent", "comment_type"),
                transformers=(("empty_string", {}),),
            ),
            Mapping(
                (ref("userid"),), ("user_id",),
                transformers=(
                    ("if_then_else_numeric",
                     {"condition": "x>0", "then": "x=x-819",
                      "otherwise": "0", "format": "num"}),
                ),
            ),
        ),
    )
    return Pipeline("joomla2wp-comments", (src,), (tgt,), (recipe,))


@requires_fixtures
def test_jcomments_to_wp_comments_golden(spark, derby_url):
    jvm_execute(spark, derby_url, JCOMMENTS_DDL, DRIVER)

    pipeline = _comments_pipeline(derby_url)
    # Parser row count: 4 (Joomla2WP.scala:697-699).
    assert read_source(spark, pipeline.source("jcomments")).count() == 4

    run_pipeline(spark, pipeline)

    back = read_source(
        spark,
        SourceSpec(
            "WP_COMMENTS", "jdbc", derby_url,
            options={"driver": DRIVER, "table": "WP_COMMENTS"},
        ),
    ).orderBy("comment_id")
    rows = back.collect()

    # Golden values: Joomla2WP.scala:705-727.
    assert [r["comment_id"] for r in rows] == [4, 5, 6, 7]
    first = rows[0]
    assert first["comment_post_id"] == 2
    assert first["comment_author"] == "Christian"
    assert first["comment_author_email"] == "christian@wegtam.com"
    assert first["comment_author_url"] == ""
    assert first["comment_author_ip"] == "127.0.0.1"
    assert first["comment_date"] == datetime(2015, 9, 17, 8, 38, 46)
    assert first["comment_date_gmt"] == datetime(2015, 9, 17, 8, 38, 46)
    assert first["comment_content"] == "1. Kommentar 8)"
    assert first["comment_karma"] == 0
    assert first["comment_approved"] == "1"
    assert first["comment_agent"] == ""
    assert first["comment_type"] == ""
    assert first["comment_parent"] == 0
    assert first["user_id"] == 0
    assert rows[1]["comment_content"] == COMMENT_BODY_5
