"""Filesystem IO for table metadata via the Hadoop FileSystem API.

The LakeTable commit log must work wherever a 100 TB table lives — HDFS,
S3A, or a plain local path. Driver-side ``os.*`` calls only work on the
last of those, so all manifest reads/lists/commits route through the JVM's
``org.apache.hadoop.fs.FileSystem`` (the same abstraction Spark's own
committers use; reference PutIceberg relies on Iceberg's FileIO for the
identical reason). A plain ``/path`` resolves to the local filesystem, a
``file:///`` URI likewise, ``hdfs://`` / ``s3a://`` to their schemes —
no code change per store.

Atomicity contract for :meth:`rename_no_overwrite`: Hadoop rename fails
(returns false) when the destination exists — on HDFS this check-and-move
is atomic at the NameNode; on the local filesystem there is a tiny
check/act window (two same-host racers), which the LakeTable commit
protocol tolerates because a losing writer re-reads the head and rebases
(see laketable._commit). On S3A, rename is copy+delete (not atomic) —
single-writer or an external lock is required there, as for any
S3-without-catalog table format.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def join(*parts: str) -> str:
    """Path join that preserves URI schemes (os.path.join breaks on them)."""
    out = parts[0].rstrip("/")
    for p in parts[1:]:
        out += "/" + p.strip("/")
    return out


class FsIO:
    """Thin py4j wrapper over ``FileSystem`` for small-metadata IO.

    Every method takes path strings (plain, file://, hdfs://, s3a://...).
    Not for bulk data — data files are written/read by Spark itself.
    """

    def __init__(self, spark: SparkSession, base: str):
        self._jvm = spark._jvm
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(base).getFileSystem(spark._jsc.hadoopConfiguration())

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._Path(path))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._Path(path))

    def delete(self, path: str) -> None:
        self._fs.delete(self._Path(path), True)

    def list_names(self, path: str) -> list[str]:
        """Basenames of a directory's children ([] when absent)."""
        p = self._Path(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._Path(path))
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
            return "\n".join(lines)
        finally:
            stream.close()

    def write_text(self, path: str, content: str, overwrite: bool = True) -> None:
        out = self._fs.create(self._Path(path), overwrite)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()

    def rename_no_overwrite(self, src: str, dst: str) -> bool:
        """Move src→dst; False when dst already exists (commit race lost)."""
        return bool(self._fs.rename(self._Path(src), self._Path(dst)))
