"""SQL metastore dialect layer (sqlite file DB / PostgreSQL server).

The reference ships two production metastores: file-backed and PostgreSQL
(`quickwit-metastore/src/metastore/postgres/metastore.rs` — one database
hosts every index, rows keyed by index uid, each metastore op is one ACID
transaction). This module gives the repo's :class:`Manifest` the same
choice behind one API:

  * dialect ``sqlite`` — a per-index ``metastore.db`` file (the on-disk
    schema is unchanged from round 2: plain tables, ``?`` params).
  * dialect ``postgres`` — a shared server database; every table carries
    an ``index_uid`` column (composite primary keys), params are ``%s``,
    upserts are ``INSERT .. ON CONFLICT .. DO UPDATE`` — the reference's
    multi-index layout.

Connections come from a DSN-scheme driver registry: ``postgresql://`` /
``postgres://`` DSNs use psycopg2 when installed (not in this sandbox);
tests register fake drivers (any DBAPI connection works — cursor(),
commit(), rollback()). The DSN for an index is pinned in a
``metastore.json`` pointer file next to the artifacts, so every
``Manifest(index_dir)`` resolves the same server.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Optional

# -- DSN driver registry ------------------------------------------------------

_DRIVERS: dict[str, Callable[[str], Any]] = {}


def register_driver(scheme: str, factory: Callable[[str], Any]) -> None:
    """Register a DBAPI connection factory for a DSN scheme (tests inject
    fakes; deployments could map ``postgresql`` to psycopg2.connect)."""
    _DRIVERS[scheme] = factory


def _default_postgres(dsn: str):
    try:
        import psycopg2  # type: ignore
    except ImportError as e:  # pragma: no cover — not installed here
        raise RuntimeError(
            "postgres metastore requires psycopg2 (not installed); "
            "register_driver() a factory for this DSN scheme instead") from e
    return psycopg2.connect(dsn)  # pragma: no cover


def connect_dsn(dsn: str):
    scheme = dsn.split("://", 1)[0]
    factory = _DRIVERS.get(scheme)
    if factory is None and scheme in ("postgres", "postgresql"):
        factory = _default_postgres
    if factory is None:
        raise ValueError(f"no driver registered for DSN scheme {scheme!r}")
    return factory(dsn)


# -- store --------------------------------------------------------------------

_SQLITE_DDL = [
    "CREATE TABLE IF NOT EXISTS meta (key TEXT PRIMARY KEY, value TEXT)",
    "CREATE TABLE IF NOT EXISTS splits (split_id TEXT PRIMARY KEY, json TEXT)",
    "CREATE TABLE IF NOT EXISTS checkpoints (partition TEXT PRIMARY KEY, json TEXT)",
    "CREATE TABLE IF NOT EXISTS delete_tasks (opstamp INTEGER PRIMARY KEY, query TEXT)",
    "CREATE TABLE IF NOT EXISTS shards (shard_id TEXT PRIMARY KEY, json TEXT)",
    "CREATE TABLE IF NOT EXISTS sources (source_id TEXT PRIMARY KEY, json TEXT)",
]

# reference layout: one database, rows scoped by index_uid
# (postgres/metastore.rs `indexes` / `splits` tables)
_PG_DDL = [
    "CREATE TABLE IF NOT EXISTS meta (index_uid TEXT NOT NULL, key TEXT NOT NULL,"
    " value TEXT, PRIMARY KEY (index_uid, key))",
    "CREATE TABLE IF NOT EXISTS splits (index_uid TEXT NOT NULL, split_id TEXT"
    " NOT NULL, json TEXT, PRIMARY KEY (index_uid, split_id))",
    "CREATE TABLE IF NOT EXISTS checkpoints (index_uid TEXT NOT NULL, partition"
    " TEXT NOT NULL, json TEXT, PRIMARY KEY (index_uid, partition))",
    "CREATE TABLE IF NOT EXISTS delete_tasks (index_uid TEXT NOT NULL, opstamp"
    " BIGINT NOT NULL, query TEXT, PRIMARY KEY (index_uid, opstamp))",
    "CREATE TABLE IF NOT EXISTS shards (index_uid TEXT NOT NULL, shard_id TEXT"
    " NOT NULL, json TEXT, PRIMARY KEY (index_uid, shard_id))",
    "CREATE TABLE IF NOT EXISTS sources (index_uid TEXT NOT NULL, source_id"
    " TEXT NOT NULL, json TEXT, PRIMARY KEY (index_uid, source_id))",
]

_PK = {"meta": "key", "splits": "split_id", "checkpoints": "partition",
       "delete_tasks": "opstamp", "shards": "shard_id",
       "sources": "source_id"}
_COLS = {"meta": ("key", "value"), "splits": ("split_id", "json"),
         "checkpoints": ("partition", "json"),
         "delete_tasks": ("opstamp", "query"), "shards": ("shard_id", "json"),
         "sources": ("source_id", "json")}


class SqlStore:
    """Dialect-normalized DBAPI wrapper for the manifest's five tables.

    All SQL the manifest needs is expressed as four verbs (upsert /
    insert_ignore / delete / select_all) so each dialect renders its own
    placeholder + conflict syntax; ``tx()`` is one ACID transaction."""

    def __init__(self, conn, dialect: str, index_uid: str = ""):
        assert dialect in ("sqlite", "postgres")
        self.conn = conn
        self.dialect = dialect
        self.index_uid = index_uid
        self._p = "?" if dialect == "sqlite" else "%s"

    # -- bootstrap --------------------------------------------------------

    def create_tables(self) -> None:
        ddl = _SQLITE_DDL if self.dialect == "sqlite" else _PG_DDL
        cur = self.conn.cursor()
        for stmt in ddl:
            cur.execute(stmt)
        self.conn.commit()

    # -- transactions ------------------------------------------------------

    def tx(self) -> "_Tx":
        return _Tx(self.conn)

    # -- verbs (cur: pass the open transaction's cursor) -------------------

    def _scope(self, row: tuple) -> tuple:
        return row if self.dialect == "sqlite" else (self.index_uid, *row)

    def _cols(self, table: str) -> list[str]:
        cols = list(_COLS[table])
        return cols if self.dialect == "sqlite" else ["index_uid"] + cols

    def _pk(self, table: str) -> list[str]:
        pk = [_PK[table]]
        return pk if self.dialect == "sqlite" else ["index_uid"] + pk

    def upsert(self, cur, table: str, row: tuple) -> None:
        cols = self._cols(table)
        ph = ", ".join([self._p] * len(cols))
        if self.dialect == "sqlite":
            cur.execute(f"INSERT OR REPLACE INTO {table} VALUES ({ph})",
                        self._scope(row))
            return
        pk = self._pk(table)
        sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in cols if c not in pk)
        cur.execute(
            f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({ph}) "
            f"ON CONFLICT ({', '.join(pk)}) DO UPDATE SET {sets}",
            self._scope(row))

    def insert_ignore(self, cur, table: str, row: tuple) -> None:
        cols = self._cols(table)
        ph = ", ".join([self._p] * len(cols))
        if self.dialect == "sqlite":
            cur.execute(f"INSERT OR IGNORE INTO {table} VALUES ({ph})",
                        self._scope(row))
            return
        pk = self._pk(table)
        cur.execute(
            f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({ph}) "
            f"ON CONFLICT ({', '.join(pk)}) DO NOTHING", self._scope(row))

    def delete_where_pk(self, cur, table: str, key) -> None:
        if self.dialect == "sqlite":
            cur.execute(f"DELETE FROM {table} WHERE {_PK[table]} = {self._p}",
                        (key,))
        else:
            cur.execute(
                f"DELETE FROM {table} WHERE index_uid = {self._p} "
                f"AND {_PK[table]} = {self._p}", (self.index_uid, key))

    def delete_all(self, cur, table: str) -> None:
        if self.dialect == "sqlite":
            cur.execute(f"DELETE FROM {table}")
        else:
            cur.execute(f"DELETE FROM {table} WHERE index_uid = {self._p}",
                        (self.index_uid,))

    def select_all(self, table: str, order_by: Optional[str] = None
                   ) -> list[tuple]:
        cols = ", ".join(_COLS[table])
        sql = f"SELECT {cols} FROM {table}"
        args: tuple = ()
        if self.dialect == "postgres":
            sql += f" WHERE index_uid = {self._p}"
            args = (self.index_uid,)
        if order_by:
            sql += f" ORDER BY {order_by}"
        cur = self.conn.cursor()
        cur.execute(sql, args)
        return list(cur.fetchall())


class _Tx:
    """Commit-on-success / rollback-on-error transaction scope holding one
    cursor (works for sqlite3 connections and any DBAPI server conn)."""

    def __init__(self, conn):
        self.conn = conn
        self.cur = None

    def __enter__(self):
        self.cur = self.conn.cursor()
        return self.cur

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.conn.commit()
        else:
            self.conn.rollback()


# -- metastore pointer file -----------------------------------------------

def write_pointer(index_dir: str, dsn: str,
                  index_uid: Optional[str] = None) -> None:
    """Pin the DSN (and the row-scope uid, so the artifact dir can move
    or be mounted at another path without orphaning its rows). Storage-
    aware: the pointer may live on object storage next to the artifacts
    (the reference's PG-metastore + S3-artifacts layout)."""
    from quickwit_ray import storage

    obj: dict[str, Any] = {"backend": "postgres", "dsn": dsn}
    if index_uid is not None:
        obj["index_uid"] = index_uid
    storage.makedirs(index_dir)
    storage.write_bytes(storage.join(index_dir, "metastore.json"),
                        json.dumps(obj).encode())


def read_pointer(index_dir: str) -> Optional[dict[str, Any]]:
    from quickwit_ray import storage

    p = storage.join(index_dir, "metastore.json")
    if not storage.exists(p):
        return None
    return json.loads(storage.read_bytes(p))
