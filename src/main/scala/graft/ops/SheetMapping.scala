package graft.ops

/** Schema-as-config for the Excel relationship sheets — the reference's
  * `worksheet_metadata` table (/root/reference/main.py:182-266) modeled as
  * case classes driving one generic DataFrame transform (SURVEY.md §1.4).
  *
  * `label` strings are preserved verbatim, including the five labels with
  * trailing spaces (`"MedicationClass "` etc., main.py:243-263) — those are
  * distinct labels in the reference's output and golden tests pin them.
  */
final case class NodeSpec(label: String, display: String, valueCol: Int, idCol: Int)

final case class SheetMapping(node1: NodeSpec, node2: NodeSpec, relType: String)

object SheetMapping {

  /** The reference's active per-sheet configuration, keyed by sheet index
    * (main.py:182-266; indices 0, 1 and 7 are empty `{}` placeholders). */
  val referenceConfig: Map[Int, SheetMapping] = Map(
    2 -> SheetMapping(
      NodeSpec("SurgicalExtent", "Surgical Extent", 0, 1),
      NodeSpec("OutcomeType", "Outcome Type", 8, 6), "ASSOCIATED_WITH"),
    3 -> SheetMapping(
      NodeSpec("MedicationAPI", "Medication: API", 0, 1),
      NodeSpec("OutcomeType", "Outcome Type", 2, 3), "CAUSED_OUTCOME"),
    4 -> SheetMapping(
      NodeSpec("NeoplasmType", "Neoplasm Type", 12, 13),
      NodeSpec("Gene", "Gene", 0, 1), "HAS_BIOMARKER"),
    5 -> SheetMapping(
      NodeSpec("MedicationAPI", "Medication: API", 0, 1),
      NodeSpec("NeoplasmType", "Neoplasm Type", 2, 3), "TREATS"),
    6 -> SheetMapping(
      NodeSpec("MedicationAPI", "Medication: API", 0, 1),
      NodeSpec("Gene", "Gene", 2, 3), "HAS_TARGET"),
    8 -> SheetMapping(
      NodeSpec("MedicationAPI", "Medication: API", 0, 1),
      NodeSpec("Gene", "Gene", 2, 3), "HAS_PREDICTIVE_BIOMARKER"),
    9 -> SheetMapping(
      NodeSpec("DiseaseType", "Disease Type", 0, 1),
      NodeSpec("Technique", "Technique", 2, 3), "HAS_REASON"),
    10 -> SheetMapping(
      NodeSpec("NeoplasmType", "Neoplasm Type", 0, 1),
      NodeSpec("MorphologyType", "Morphology Type", 2, 3), "HAS_MORPHOLOGY"),
    11 -> SheetMapping(
      NodeSpec("NeoplasmType", "Neoplasm Type", 0, 1),
      NodeSpec("Stage", "Prognostic Measures Value Type", 2, 3), "HAS_STAGE"),
    12 -> SheetMapping(
      NodeSpec("MedicationAPI", "Medication: API", 0, 1),
      NodeSpec("Mechanism", "Mechanism of action", 2, 3), "HAS_MECHANISM"),
    13 -> SheetMapping(
      NodeSpec("NeoplasmType", "Neoplasm Type", 0, 1),
      NodeSpec("BodyPart", "Body Part", 2, 3), "HAS_LOCATION"),
    14 -> SheetMapping(
      NodeSpec("NeoplasmType", "Neoplasm Type", 0, 1),
      NodeSpec("SurgicalExtent ", "Surgical Extent", 2, 3), "TREATS"),
    15 -> SheetMapping(
      NodeSpec("NeoplasmType", "Neoplasm Type", 0, 1),
      NodeSpec("Behavior ", "Behavior", 2, 3), "HAS_BEHAVIOR"),
    16 -> SheetMapping(
      NodeSpec("NeoplasmType", "Neoplasm Type", 0, 1),
      NodeSpec("Technique ", "Technique", 2, 3), "TREATS"),
    17 -> SheetMapping(
      NodeSpec("MedicationAPI", "Medication: API", 0, 1),
      NodeSpec("DiseaseType ", "Disease Type", 2, 3), "CAUSED_SIDE_EFFECT"),
    18 -> SheetMapping(
      NodeSpec("MedicationAPI", "Medication: API", 0, 1),
      NodeSpec("MedicationClass ", "Medication Class", 2, 3), "MEMBER_OF"))
}
