package graft.manifest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental inventory: diff two manifest snapshots into
  * added / removed / changed / unchanged per Key — the operation downstream
  * consumers run on successive runs of the reference tool. One full-outer
  * hash join on Key; at bucket scale both sides are Key-partitioned
  * manifests so the join co-partitions without extra shuffles.
  */
object ManifestDiff {

  /** MERGE/upsert — the apply half of [[diff]]: fold a changeset into a
    * snapshot. Upserted Keys take the changeset's Size (insert-or-replace),
    * deleted Keys drop, everything else carries over. One full-outer join
    * plus one anti join, both keyed on Key, so the whole merge rides a
    * single hash partitioning of the snapshot — at inventory scale this is
    * how successive reference-tool runs maintain a canonical manifest
    * without rewriting unchanged partitions' data.
    * Inputs need (Key, Size); `deletes` needs Key. */
  def merge(snapshot: DataFrame, upserts: DataFrame,
            deletes: DataFrame): DataFrame = {
    val s = snapshot.select(col("Key"), col("Size").as("old_size"))
    val u = upserts.select(col("Key"), col("Size").as("new_size"))
    s.join(u, Seq("Key"), "full_outer")
      .select(col("Key"), coalesce(col("new_size"), col("old_size")).as("Size"))
      .join(deletes.select(col("Key")), Seq("Key"), "left_anti")
  }

  /** [[merge]] carrying the FULL manifest row (Bucket, Key, FileName,
    * Size, LastModified) instead of (Key, Size) — the variant the
    * streaming [[graft.streaming.StreamingPipelines.ManifestMaintainer]]
    * uses so each snapshot stays a complete manifest that commits
    * through the DSv2 write path. Same join shape: an upserted Key takes
    * the changeset's whole row, deleted Keys drop, everything else
    * carries over; one Key-keyed full-outer plus one anti join. */
  def mergeManifest(snapshot: DataFrame, upserts: DataFrame,
                    deletes: DataFrame): DataFrame = {
    def packed(df: DataFrame, as: String) = df.select(col("Key"),
      struct(col("Bucket"), col("FileName"), col("Size"),
        col("LastModified")).as(as))
    packed(snapshot, "_old").join(packed(upserts, "_new"), Seq("Key"), "full_outer")
      .select(col("Key"), coalesce(col("_new"), col("_old")).as("r"))
      .select(col("r.Bucket").as("Bucket"), col("Key"),
        col("r.FileName").as("FileName"), col("r.Size").as("Size"),
        col("r.LastModified").as("LastModified"))
      .join(deletes.select(col("Key")), Seq("Key"), "left_anti")
  }

  /** Inputs need (Key, Size) columns; any extra columns are ignored. */
  def diff(oldM: DataFrame, newM: DataFrame): DataFrame = {
    val o = oldM.select(col("Key"), col("Size").as("old_size"))
    val n = newM.select(col("Key"), col("Size").as("new_size"))
    o.join(n, Seq("Key"), "full_outer")
      .select(col("Key"),
        when(col("old_size").isNull, "added")
          .when(col("new_size").isNull, "removed")
          .when(col("old_size") =!= col("new_size"), "changed")
          .otherwise("unchanged").as("status"),
        col("old_size"), col("new_size"))
  }
}
