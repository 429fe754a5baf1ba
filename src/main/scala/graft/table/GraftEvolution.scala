package graft.table

import graft.format._
import org.apache.spark.sql.types._

/** Metadata-only schema evolution (reference docs/06-schema-evolution.md:9-51):
  * every change creates a NEW schema version in the metadata file; no data file
  * is touched. Columns are tracked by stable IDs (docs/06:55-73): rename keeps
  * the ID, drop retires it forever, and the read path (GraftScan.readResolved)
  * maps each file's write-schema to the current schema by ID so files written
  * under schema v1 stay readable under v4 (docs/06:75-90).
  */
trait GraftEvolution { self: GraftTable =>

  private def evolve(f: (TableMetadata, StructType) => StructType): TableMetadata =
    commitMetadata() { m =>
      val next = f(m, m.currentSchema)
      val newId = m.schemas.keys.max + 1
      val lastCol = math.max(m.lastColumnId,
        next.fields.map(GraftSchema.fieldId).foldLeft(0)(math.max))
      m.copy(schemas = m.schemas + (newId -> next), currentSchemaId = newId,
        lastColumnId = lastCol)
    }

  /** ALTER TABLE ... ADD COLUMN [AFTER other] (docs/06:22-28). New column gets
    * a fresh ID; files written before it read as NULL.
    */
  def addColumn(name: String, dataType: DataType, after: Option[String] = None): TableMetadata =
    evolve { (m, schema) =>
      require(!schema.fieldNames.contains(name), s"column $name already exists")
      val field = GraftSchema.withId(StructField(name, dataType, nullable = true), m.lastColumnId + 1)
      val fields = after match {
        case None => schema.fields :+ field
        case Some(a) =>
          val i = schema.fieldNames.indexOf(a)
          require(i >= 0, s"AFTER column $a not found")
          (schema.fields.take(i + 1) :+ field) ++ schema.fields.drop(i + 1)
      }
      StructType(fields)
    }

  /** ALTER TABLE ... DROP COLUMN (docs/06:33-35): removed from the current
    * schema; its ID is never reused (evolve() keeps lastColumnId monotone), so
    * old files' values for it are simply no longer projected.
    */
  def dropColumn(name: String): TableMetadata =
    evolve { (_, schema) =>
      require(schema.fieldNames.contains(name), s"column $name not found")
      require(schema.fields.length > 1, "cannot drop the only column")
      StructType(schema.fields.filterNot(_.name == name))
    }

  /** ALTER TABLE ... RENAME COLUMN (docs/06:40-42): name changes, ID stays —
    * data files still carry the old name and resolve by ID.
    */
  def renameColumn(from: String, to: String): TableMetadata =
    evolve { (_, schema) =>
      require(schema.fieldNames.contains(from), s"column $from not found")
      require(!schema.fieldNames.contains(to), s"column $to already exists")
      StructType(schema.fields.map(f => if (f.name == from) f.copy(name = to) else f))
    }

  /** ALTER COLUMN ... SET DATA TYPE — widening only (docs/06:46-51); the
    * allow/deny promotion matrix is docs/06:138-151. Old files are cast up on
    * read; narrowing is rejected because existing data could overflow.
    */
  def widenColumn(name: String, to: DataType): TableMetadata =
    evolve { (_, schema) =>
      val f = schema.fields.find(_.name == name).getOrElse(sys.error(s"column $name not found"))
      require(canPromote(f.dataType, to),
        s"cannot promote ${f.dataType.simpleString} to ${to.simpleString} (widening only)")
      StructType(schema.fields.map(x => if (x.name == name) x.copy(dataType = to) else x))
    }

  /** Partition evolution (docs/07-partitioning.md:117-129): install a new
    * default partition spec WITHOUT rewriting data. Files written under the
    * old spec keep their spec ID — the scanner prunes each file under the
    * spec it was written with — while new writes use the new spec. This is
    * the operation that lets a table move from day() to hour() partitioning
    * as volume grows, with both epochs queryable through one scan.
    */
  def evolvePartitionSpec(partitionBy: Seq[(String, Transform)]): TableMetadata =
    commitMetadata() { m =>
      val schema = m.currentSchema
      val byName = schema.fields.map(f => f.name -> f).toMap
      val fields = partitionBy.map { case (colName, tr) =>
        val f = byName.getOrElse(colName, sys.error(s"unknown partition source column $colName"))
        val suffix = tr match {
          case Transform.Identity => ""
          case t => "_" + t.name.takeWhile(_ != '[')
        }
        PartitionField(GraftSchema.fieldId(f), s"$colName$suffix", tr)
      }
      val newSpecId = m.specs.keys.max + 1
      m.copy(specs = m.specs + (newSpecId -> PartitionSpec(newSpecId, fields)),
        defaultSpecId = newSpecId)
    }

  /** required -> optional is always allowed; the reverse is not (docs/06:17). */
  def makeOptional(name: String): TableMetadata =
    evolve { (_, schema) =>
      require(schema.fieldNames.contains(name), s"column $name not found")
      StructType(schema.fields.map(f => if (f.name == name) f.copy(nullable = true) else f))
    }

  /** Promotion rules (docs/06:138-151): int->long, float->double,
    * decimal(P,S)->decimal(P',S) with P' >= P. Everything else denied.
    */
  def canPromote(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (_: ByteType | _: ShortType | _: IntegerType, _: LongType) => true
    case (_: ByteType | _: ShortType, _: IntegerType) => true
    case (_: FloatType, _: DoubleType) => true
    case (a: DecimalType, b: DecimalType) => b.scale == a.scale && b.precision >= a.precision
    case _ => false
  }
}
