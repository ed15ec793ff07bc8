package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Storage seam for the snapshot store's METADATA PLANE — manifests
  * and the clone-out ledger. The store's correctness reduces to eight
  * primitives; everything else (scan planning, DV joins, stats) reads
  * through Spark's own Hadoop-FS data plane, which is already
  * backend-abstract. Isolating these behind one trait is what keeps
  * the 3,900-line store from ossifying around POSIX: at the target
  * scale the root is an object store, and each primitive has a direct
  * object-store mapping —
  *
  *  - `publishAtomic` (THE commit CAS, create-if-absent + durable):
  *    `link(2)` here; S3 conditional PUT (`If-None-Match: *`) or
  *    ADLS `If-None-Match` etag on that backend. Returning `false`
  *    (already exists) is what surfaces as `ConcurrentCommitException`.
  *  - `replaceAtomic` (idempotent replace of CONTENT-EQUIVALENT
  *    bodies — the oldest-kept checkpoint rewrite): atomic rename
  *    here; plain PUT there (last-writer-wins is safe because both
  *    writers produce equivalent bodies).
  *  - `list` / `exists` / `delete` / `modifiedMillis`: LIST-prefix /
  *    HEAD / DELETE.
  *  - `readBytes` / `open`: GET / ranged GET (the header-only manifest
  *    scan reads a prefix and stops — `open` is what keeps that
  *    O(header) instead of O(file list) on a 10⁶-entry checkpoint).
  *
  * Paths are `java.nio.Path` used as opaque hierarchical keys; an
  * object-store backend treats them as key strings.
  */
trait StoreBackend {
  /** Full read of one metadata object. */
  def readBytes(path: Path): Array[Byte]

  /** Streaming read; callers may stop early (ranged-GET shaped). */
  def open(path: Path): java.io.InputStream

  /** Durable create-if-absent: `true` = this call created the object,
    * `false` = it already existed (the loser of a commit race). Must
    * never publish a torn body.
    */
  def publishAtomic(path: Path, bytes: Array[Byte]): Boolean

  /** Atomic replace for content-equivalent rewrites (readers see the
    * old or the new body, both resolving to the same manifest).
    */
  def replaceAtomic(path: Path, bytes: Array[Byte]): Unit

  /** Immediate child names of `dir`; empty when `dir` is absent. */
  def list(dir: Path): Seq[String]

  def exists(path: Path): Boolean

  /** Idempotent delete (absent = success). */
  def delete(path: Path): Unit

  def modifiedMillis(path: Path): Long
}

object StoreBackend {

  /** The default local/NFS backend: `link(2)` is the CAS (atomic
    * fail-if-exists on every POSIX filesystem, NFS included — the
    * classic lockfile idiom), fsync-before-link is the durability.
    */
  object Nio extends StoreBackend {
    def readBytes(path: Path): Array[Byte] = Files.readAllBytes(path)

    def open(path: Path): java.io.InputStream = Files.newInputStream(path)

    def publishAtomic(path: Path, bytes: Array[Byte]): Boolean = {
      Files.createDirectories(path.getParent)
      val tmp = path.getParent.resolve(s".tmp-${java.util.UUID.randomUUID}")
      val ch = java.nio.channels.FileChannel.open(tmp,
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      try {
        ch.write(java.nio.ByteBuffer.wrap(bytes))
        ch.force(true)
      } finally ch.close()
      try { Files.createLink(path, tmp); Files.deleteIfExists(tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          false
      }
    }

    def replaceAtomic(path: Path, bytes: Array[Byte]): Unit = {
      Files.createDirectories(path.getParent)
      val tmp = path.getParent.resolve(s".tmp-${java.util.UUID.randomUUID}")
      Files.write(tmp, bytes)
      Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

    def list(dir: Path): Seq[String] = {
      if (!Files.isDirectory(dir)) return Seq.empty
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).toVector
      finally s.close()
    }

    def exists(path: Path): Boolean = Files.isRegularFile(path)

    def delete(path: Path): Unit = Files.deleteIfExists(path)

    def modifiedMillis(path: Path): Long =
      Files.getLastModifiedTime(path).toMillis
  }

  /** A REAL alternative backend — metadata objects live in a heap map,
    * never on disk — proving the seam genuinely abstracts (the store
    * runs its whole surface with zero manifest files). Shaped like an
    * object store: `publishAtomic` = putIfAbsent (a conditional PUT),
    * `replaceAtomic` = put, `list` = prefix scan. The data plane (the
    * parquet files Spark writes) stays wherever the root points; only
    * the metadata plane moves.
    */
  final class InMemory extends StoreBackend {
    private val objects =
      new java.util.concurrent.ConcurrentHashMap[String, (Array[Byte], Long)]()
    private def key(p: Path): String = p.toAbsolutePath.normalize.toString

    def readBytes(path: Path): Array[Byte] = {
      val v = objects.get(key(path))
      if (v == null) throw new java.nio.file.NoSuchFileException(key(path))
      v._1
    }
    def open(path: Path): java.io.InputStream =
      new java.io.ByteArrayInputStream(readBytes(path))
    def publishAtomic(path: Path, bytes: Array[Byte]): Boolean =
      objects.putIfAbsent(key(path),
        (bytes, System.currentTimeMillis())) == null
    def replaceAtomic(path: Path, bytes: Array[Byte]): Unit =
      objects.put(key(path), (bytes, System.currentTimeMillis()))
    def list(dir: Path): Seq[String] = {
      val prefix = key(dir) + "/"
      objects.keySet().asScala.iterator
        .filter(k => k.startsWith(prefix) && !k.drop(prefix.length).contains('/'))
        .map(_.drop(prefix.length)).toVector
    }
    def exists(path: Path): Boolean = objects.containsKey(key(path))
    def delete(path: Path): Unit = objects.remove(key(path))
    def modifiedMillis(path: Path): Long = {
      val v = objects.get(key(path))
      if (v == null) throw new java.nio.file.NoSuchFileException(key(path))
      v._2
    }
  }

  /** Spec/bench double: counts primitive calls so tests can pin the
    * metadata-plane IO contract (e.g. "an append publishes exactly one
    * object") without parsing strace output.
    */
  final class Counting(inner: StoreBackend = Nio) extends StoreBackend {
    val calls = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    private def tick(op: String): Unit =
      calls.synchronized { calls(op) += 1 }
    def readBytes(path: Path): Array[Byte] =
      { tick("readBytes"); inner.readBytes(path) }
    def open(path: Path): java.io.InputStream =
      { tick("open"); inner.open(path) }
    def publishAtomic(path: Path, bytes: Array[Byte]): Boolean =
      { tick("publishAtomic"); inner.publishAtomic(path, bytes) }
    def replaceAtomic(path: Path, bytes: Array[Byte]): Unit =
      { tick("replaceAtomic"); inner.replaceAtomic(path, bytes) }
    def list(dir: Path): Seq[String] = { tick("list"); inner.list(dir) }
    def exists(path: Path): Boolean = { tick("exists"); inner.exists(path) }
    def delete(path: Path): Unit = { tick("delete"); inner.delete(path) }
    def modifiedMillis(path: Path): Long =
      { tick("modifiedMillis"); inner.modifiedMillis(path) }
  }

  private[etl] val Utf8 = StandardCharsets.UTF_8
}
