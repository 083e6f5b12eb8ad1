"""DDL-generator golden tests (reference A10-A15,
`cmd/tablemeta.go:48-364`)."""

from gomysql2pg_spark.ddl import (
    ForeignKeyMeta,
    IndexMeta,
    TriggerMeta,
    create_table_sql,
    foreign_key_sql,
    index_sql,
    rewrite_view_definition,
    sequence_sql,
    trigger_sql,
    view_sql,
)
from gomysql2pg_spark.functions.typemap import ColumnMeta


def test_create_table_sql():
    cols = [
        ColumnMeta(
            name="ID",
            data_type="int",
            is_nullable="NO",
            ordinal_position=1,
        ),
        ColumnMeta(
            name="Name",
            data_type="varchar",
            char_max_len=50,
            default="x",
            ordinal_position=2,
        ),
        ColumnMeta(name="body", data_type="longtext", ordinal_position=3),
    ]
    drop, create = create_table_sql("MyTable", cols)
    assert drop == 'drop table if exists "mytable" cascade'
    assert create == (
        'create table "mytable" ("id" int not null, '
        "\"name\" varchar(50) default 'x', \"body\" text)"
    )


def test_create_table_flag_variants():
    cols = [
        ColumnMeta(
            name="v", data_type="varchar", char_max_len=10, ordinal_position=1
        )
    ]
    assert "varchar(10 char)" in create_table_sql("t", cols, char_in_length=True)[1]
    assert "nvarchar2(10)" in create_table_sql("t", cols, use_nvarchar2=True)[1]


def test_sequence_sql():
    stmts = sequence_sql("Orders", "ID", 1001)
    assert stmts == [
        "drop sequence if exists seq_orders_id",
        "create sequence seq_orders_id increment by 1 start 1001",
        'alter table "orders" alter column "id" '
        "set default nextval('seq_orders_id')",
    ]


def test_index_sql_variants():
    pk = IndexMeta("T", "PRIMARY", ["a", "b"], non_unique=False)
    assert index_sql(pk) == 'alter table "t" add primary key ("a", "b")'
    assert index_sql(pk, distributed=True).startswith(
        'alter table "t" distribute by hash ("a", "b"); '
    )
    uniq = index_sql(
        IndexMeta("T", "IX_Name", ["c"], non_unique=False), suffix="abcd1234"
    )
    assert uniq == 'create unique index ix_name_abcd1234 on "t" ("c")'
    plain = index_sql(
        IndexMeta("T", "IX2", ["c", "d"], non_unique=True), suffix="ff00ff00"
    )
    assert plain == 'create index ix2_ff00ff00 on "t" ("c", "d")'


def test_foreign_key_sql():
    fk = ForeignKeyMeta(
        table="Orders",
        constraint_name="FK_Cust",
        columns=["cust_id"],
        ref_table="Customer",
        ref_columns=["id"],
        delete_rule="CASCADE",
        update_rule="NO ACTION",
    )
    assert foreign_key_sql(fk) == (
        'alter table "orders" add constraint fk_cust foreign key '
        '("cust_id") references "customer" ("id") '
        "on delete cascade on update no action"
    )


def test_view_rewrites():
    d = "select `a`, convert(`b` using utf8mb4) from mydb.`t`"
    out = rewrite_view_definition(d, "mydb")
    assert out == "select a, b from t"
    assert view_sql("V1", d, "mydb") == (
        "create or replace view v1 as select a, b from t"
    )


def test_trigger_sql_comment_rewrite():
    trg = TriggerMeta(
        name="Trg",
        table="T",
        timing="BEFORE",
        event="INSERT",
        body="# set it\nset new.x = 1;",
    )
    out = trigger_sql(trg)
    assert "-- set it" in out
    assert out.startswith(
        'create or replace trigger trg before insert on "t" for each row as'
    )


def test_trigger_sql_pg_two_statement_form():
    from gomysql2pg_spark.ddl import TriggerMeta, trigger_sql_pg

    trg = TriggerMeta(
        name="TRG",
        table="T",
        timing="BEFORE",
        event="INSERT",
        body="# note\nSET NEW.x = NEW.x + 1\nperform 1",
    )
    func, trig = trigger_sql_pg(trg)
    assert func.startswith(
        "create or replace function trg_tgfn() returns trigger"
    )
    assert "-- note" in func
    assert "new.x := NEW.x + 1;" in func
    assert "perform 1;" in func
    assert "if tg_op = 'DELETE' then return old" in func
    assert trig == (
        'create or replace trigger trg before insert on "t" '
        "for each row execute function trg_tgfn()"
    )


def test_view_rewrite_empty_schema_keeps_dots():
    """r13 review finding: with the (default) empty source schema the
    prefix strip degenerated to removing EVERY dot — 'a.x' -> 'ax',
    '1.5' -> '15' — corrupting any metadata-block view that omitted
    sourceSchema."""
    from gomysql2pg_spark.ddl import view_sql

    out = view_sql("v1", "select a.x, 1.5 as y from tbl a")
    assert "a.x" in out and "1.5" in out


def test_trigger_pg_form_keeps_if_blocks_valid():
    """r13 review finding: the line-terminator pass appended ';' to
    EVERY unterminated line, turning 'IF ... THEN' into the plpgsql
    syntax error 'IF ... THEN;'. Block-opening lines stay bare."""
    from gomysql2pg_spark.ddl import TriggerMeta, trigger_sql_pg

    trg = TriggerMeta(
        name="trg_block",
        table="orders",
        timing="BEFORE",
        event="UPDATE",
        body=(
            "IF NEW.qty > 0 THEN\n"
            "  SET NEW.total = NEW.qty * 2;\n"
            "END IF;"
        ),
    )
    func_sql, _ = trigger_sql_pg(trg)
    assert "if new.qty > 0 then\n" in func_sql.lower().replace("  ", "")
    assert "then;" not in func_sql.lower()
    assert "new.total := new.qty * 2;" in func_sql.lower()
