package graft.queries

/** DuckDB oracle SQL for the three flagship index products — the full
  * nested documents recomputed relationally and serialized with
  * DuckDB's to_json, byte-identical to the Canon-flattened Spark
  * output (verified column-by-column at build time). Kept verbatim in
  * one place because the three share their CTE prefix (donor nests,
  * phenotype expansion, diagnosis branch, files-with-biospecimen).
  */
object IndexOracles {
  import SourceQueries.FixtureDir

  val donorIndexSql: String = raw"""WITH donor AS (SELECT * FROM read_csv('${FixtureDir}/donor.tsv', delim='\t', header=true, all_varchar=true)),
study AS (SELECT * FROM read_csv('${FixtureDir}/study.tsv', delim='\t', header=true, all_varchar=true)),
fam AS (
  SELECT submitter_donor_id,
    list(struct_pack(submitter_family_id := submitter_family_id,
      family_type := family_type,
      relationship_to_proband := relationship_to_proband)
      ORDER BY submitter_family_id, family_type, relationship_to_proband)
      AS family_relationships
  FROM read_csv('${FixtureDir}/family.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
fh AS (
  SELECT submitter_donor_id,
    list(struct_pack(
      submitter_family_condition_id := submitter_family_condition_id,
      family_condition_name := family_condition_name,
      family_condition_age := family_condition_age,
      family_condition_relationship := family_condition_relationship)
      ORDER BY submitter_family_condition_id) AS family_conditions
  FROM read_csv('${FixtureDir}/family_history.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
ex AS (
  SELECT submitter_donor_id,
    list(struct_pack(smoking_status := smoking_status,
      alcohol_status := alcohol_status)
      ORDER BY smoking_status, alcohol_status) AS exposures
  FROM read_csv('${FixtureDir}/exposure.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
sarr AS (
  SELECT study_id, [struct_pack(name := name, domain := domain,
    access_limitations := access_limitations,
    access_requirements := access_requirements,
    internal_notes := internal_notes)] AS study
  FROM study),
ph AS (
  SELECT *, phenotype_observed IN ('YES','Yes','yes','TRUE','True','true','Y','y','1') AS obs
  FROM read_csv('${FixtureDir}/phenotype.tsv', delim='\t', header=true, all_varchar=true)),
hpo AS (SELECT * FROM read_json_auto('${FixtureDir}/terms.jsonl.gz')),
ph_expanded AS (
  SELECT p.study_id, p.submitter_donor_id, p.obs, t.id AS term_id,
         t.name AS term_name, true AS is_tagged,
         coalesce(t.is_leaf, false) AS is_leaf, p.age_at_phenotype AS age
  FROM ph p JOIN hpo t ON p.phenotype_HPO_code = t.id
  UNION ALL
  SELECT p.study_id, p.submitter_donor_id, p.obs, anc.a.id, anc.a.name,
         false, false, p.age_at_phenotype
  FROM ph p JOIN hpo t ON p.phenotype_HPO_code = t.id,
       (SELECT unnest(t2.ancestors) AS a, t2.id AS tid FROM hpo t2) anc
  WHERE anc.tid = t.id),
ph_merged AS (
  SELECT study_id, submitter_donor_id, obs, term_id,
    min(term_name) AS term_name, bool_or(is_tagged) AS is_tagged,
    bool_or(is_leaf) AS is_leaf,
    list_sort(list_distinct(list(age))) AS vals
  FROM ph_expanded GROUP BY 1,2,3,4),
ph_nested AS (
  SELECT study_id, submitter_donor_id, obs,
    list(struct_pack(term_id := term_id, term_name := term_name,
      is_tagged := is_tagged, is_leaf := is_leaf, "values" := vals)
      ORDER BY term_id) AS phenos
  FROM ph_merged GROUP BY 1,2,3),
ph_piv AS (
  SELECT study_id, submitter_donor_id,
    any_value(phenos) FILTER (WHERE obs) AS observed_phenotypes,
    any_value(phenos) FILTER (WHERE NOT obs) AS non_observed_phenotypes
  FROM ph_nested GROUP BY 1,2),
diag AS (SELECT * FROM read_csv('${FixtureDir}/diagnosis.tsv', delim='\t', header=true, all_varchar=true)),
mondo AS (SELECT * FROM read_json_auto('${FixtureDir}/mondo_terms.jsonl.gz')),
icd AS (
  SELECT regexp_extract(id, '^(.*)\|([1-9]*)', 1) AS id, name, ancestors, is_leaf
  FROM read_json_auto('${FixtureDir}/icd_terms.jsonl.gz')),
mondo_mc AS (
  SELECT id, min(a.name || ' (' || a.id || ')') AS mc
  FROM (SELECT id, unnest(ancestors) AS a FROM mondo)
  WHERE list_contains(a.parents, 'disease or disorder (MONDO:0000001)')
  GROUP BY id),
icd_mc AS (
  SELECT id, min(a.name || ' (' || a.id || ')') AS mc
  FROM (SELECT id, unnest(ancestors) AS a FROM icd)
  WHERE regexp_matches(a.id, '^[A-Z][0-9]{2}-[A-Z][0-9]{2}')
  GROUP BY id),
trn AS (
  SELECT submitter_diagnosis_id,
    list(struct_pack(submitter_treatment_id := submitter_treatment_id,
      treatment_type := treatment_type, treatment_intent := treatment_intent)
      ORDER BY submitter_treatment_id, treatment_type, treatment_intent) AS treatments
  FROM read_csv('${FixtureDir}/treatment.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
fun AS (
  SELECT submitter_diagnosis_id,
    list(struct_pack(submitter_follow_up_id := submitter_follow_up_id,
      days_to_follow_up := days_to_follow_up, disease_status := disease_status)
      ORDER BY submitter_follow_up_id, days_to_follow_up, disease_status) AS follow_ups
  FROM read_csv('${FixtureDir}/follow_up.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
diag_nested AS (
  SELECT study_id, submitter_donor_id,
    list(struct_pack(
      submitter_diagnosis_id := d.submitter_diagnosis_id,
      diagnosis_mondo_code := diagnosis_mondo_code,
      diagnosis_ICD_code := diagnosis_ICD_code,
      age_at_diagnosis := age_at_diagnosis,
      is_cancer := is_cancer,
      mondo_main_category := m.mc,
      icd_main_category := i.mc,
      treatments := trn.treatments,
      follow_ups := fun.follow_ups) ORDER BY d.submitter_diagnosis_id) AS diagnoses
  FROM diag d
  LEFT JOIN mondo_mc m ON d.diagnosis_mondo_code = m.id
  LEFT JOIN icd_mc i ON d.diagnosis_ICD_code = i.id
  LEFT JOIN trn ON d.submitter_diagnosis_id = trn.submitter_diagnosis_id
  LEFT JOIN fun ON d.submitter_diagnosis_id = fun.submitter_diagnosis_id
  GROUP BY 1, 2),
mondo_expanded AS (
  SELECT p.study_id, p.submitter_donor_id, t.id AS term_id, t.name AS term_name,
         true AS is_tagged, coalesce(t.is_leaf, false) AS is_leaf,
         p.age_at_diagnosis AS age
  FROM diag p JOIN mondo t ON p.diagnosis_mondo_code = t.id
  UNION ALL
  SELECT p.study_id, p.submitter_donor_id, anc.a.id, anc.a.name, false, false,
         p.age_at_diagnosis
  FROM diag p JOIN mondo t ON p.diagnosis_mondo_code = t.id,
       (SELECT unnest(t2.ancestors) AS a, t2.id AS tid FROM mondo t2) anc
  WHERE anc.tid = t.id),
mondo_nested AS (
  SELECT study_id, submitter_donor_id,
    list(struct_pack(term_id := term_id, term_name := term_name,
      is_tagged := is_tagged, is_leaf := is_leaf, "values" := vals)
      ORDER BY term_id) AS mondo
  FROM (
    SELECT study_id, submitter_donor_id, term_id, min(term_name) AS term_name,
      bool_or(is_tagged) AS is_tagged, bool_or(is_leaf) AS is_leaf,
      list_sort(list_distinct(list(age))) AS vals
    FROM mondo_expanded GROUP BY 1,2,3)
  GROUP BY 1,2),
icd_expanded AS (
  SELECT p.study_id, p.submitter_donor_id, t.id AS term_id, t.name AS term_name,
         true AS is_tagged, coalesce(t.is_leaf, false) AS is_leaf,
         p.age_at_diagnosis AS age
  FROM diag p JOIN icd t ON p.diagnosis_ICD_code = t.id
  UNION ALL
  SELECT p.study_id, p.submitter_donor_id, anc.a.id, anc.a.name, false, false,
         p.age_at_diagnosis
  FROM diag p JOIN icd t ON p.diagnosis_ICD_code = t.id,
       (SELECT unnest(t2.ancestors) AS a, t2.id AS tid FROM icd t2) anc
  WHERE anc.tid = t.id),
icd_nested AS (
  SELECT study_id, submitter_donor_id,
    list(struct_pack(term_id := term_id, term_name := term_name,
      is_tagged := is_tagged, is_leaf := is_leaf, "values" := vals)
      ORDER BY term_id) AS icd
  FROM (
    SELECT study_id, submitter_donor_id, term_id, min(term_name) AS term_name,
      bool_or(is_tagged) AS is_tagged, bool_or(is_leaf) AS is_leaf,
      list_sort(list_distinct(list(age))) AS vals
    FROM icd_expanded GROUP BY 1,2,3)
  GROUP BY 1,2),
diag_exp AS (
  SELECT coalesce(m.study_id, i.study_id) AS study_id,
    coalesce(m.submitter_donor_id, i.submitter_donor_id) AS submitter_donor_id,
    m.mondo, i.icd
  FROM mondo_nested m
  FULL JOIN icd_nested i
    ON m.study_id = i.study_id AND m.submitter_donor_id = i.submitter_donor_id),
samples_nested AS (
  SELECT submitter_biospecimen_id,
    list(struct_pack(submitter_sample_id := submitter_sample_id,
      sample_type := sample_type)
      ORDER BY submitter_sample_id, sample_type) AS samples
  FROM read_csv('${FixtureDir}/sample_registration.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
bio AS (
  SELECT b.submitter_biospecimen_id,
    struct_pack(biospecimen_tissue_source := b.biospecimen_tissue_source,
      biospecimen_type := b.biospecimen_type, is_cancer := b.is_cancer,
      samples := coalesce(s.samples, [])) AS biospecimen
  FROM read_csv('${FixtureDir}/biospecimen.tsv', delim='\t', header=true, all_varchar=true) b
  LEFT JOIN samples_nested s ON b.submitter_biospecimen_id = s.submitter_biospecimen_id),
files_nested AS (
  SELECT f.study_id, f.submitter_donor_id,
    list(struct_pack(file_name := f.file_name, data_category := f.data_category,
      data_type := f.data_type, experimental_strategy := f.experimental_strategy,
      file_format := f.file_format, data_access := f.data_access,
      biospecimen := bio.biospecimen) ORDER BY f.file_name) AS files
  FROM read_csv('${FixtureDir}/file.tsv', delim='\t', header=true, all_varchar=true) f
  LEFT JOIN bio ON f.submitter_biospecimen_id = bio.submitter_biospecimen_id
  GROUP BY 1, 2)
SELECT d.study_id, d.submitter_donor_id, d.dob, d."age TODAY", d.gender,
  d.ethnicity, d.vital_status, d.is_a_proband,
  to_json(fam.family_relationships) AS family_relationships_json,
  to_json(fh.family_conditions) AS family_conditions_json,
  to_json(ex.exposures) AS exposures_json,
  to_json(sarr.study) AS study_json,
  to_json(ph_piv.observed_phenotypes) AS observed_phenotypes_json,
  to_json(ph_piv.non_observed_phenotypes) AS non_observed_phenotypes_json,
  to_json(dn.diagnoses) AS diagnoses_json,
  to_json(de.mondo) AS mondo_json,
  to_json(de.icd) AS icd_json,
  to_json(fn.files) AS files_json,
  to_json(struct_pack(
    data_category := coalesce(list_sort(list_distinct(
      list_transform(fn.files, x -> x.data_category))), []),
    experimental_strategy := coalesce(list_sort(list_distinct(
      list_transform(fn.files, x -> x.experimental_strategy))), []),
    n_files := coalesce(len(fn.files), 0),
    files_available := coalesce(len(fn.files), 0) > 0,
    clinical_data_available := ph_piv.observed_phenotypes IS NOT NULL
      OR dn.diagnoses IS NOT NULL)) AS summary_json,
  '9.9' AS dictionary_version,
  'v42' AS study_version
FROM donor d
LEFT JOIN fam ON d.submitter_donor_id = fam.submitter_donor_id
LEFT JOIN fh ON d.submitter_donor_id = fh.submitter_donor_id
LEFT JOIN ex ON d.submitter_donor_id = ex.submitter_donor_id
LEFT JOIN sarr ON d.study_id = sarr.study_id
LEFT JOIN ph_piv ON d.study_id = ph_piv.study_id
  AND d.submitter_donor_id = ph_piv.submitter_donor_id
LEFT JOIN diag_nested dn ON d.study_id = dn.study_id
  AND d.submitter_donor_id = dn.submitter_donor_id
LEFT JOIN diag_exp de ON d.study_id = de.study_id
  AND d.submitter_donor_id = de.submitter_donor_id
LEFT JOIN files_nested fn ON d.study_id = fn.study_id
  AND d.submitter_donor_id = fn.submitter_donor_id"""

  val studyIndexSql: String = raw"""WITH donor AS (SELECT * FROM read_csv('${FixtureDir}/donor.tsv', delim='\t', header=true, all_varchar=true)),
study AS (SELECT * FROM read_csv('${FixtureDir}/study.tsv', delim='\t', header=true, all_varchar=true)),
fam AS (
  SELECT submitter_donor_id,
    list(struct_pack(submitter_family_id := submitter_family_id,
      family_type := family_type,
      relationship_to_proband := relationship_to_proband)
      ORDER BY submitter_family_id, family_type, relationship_to_proband)
      AS family_relationships
  FROM read_csv('${FixtureDir}/family.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
fh AS (
  SELECT submitter_donor_id,
    list(struct_pack(
      submitter_family_condition_id := submitter_family_condition_id,
      family_condition_name := family_condition_name,
      family_condition_age := family_condition_age,
      family_condition_relationship := family_condition_relationship)
      ORDER BY submitter_family_condition_id) AS family_conditions
  FROM read_csv('${FixtureDir}/family_history.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
ex AS (
  SELECT submitter_donor_id,
    list(struct_pack(smoking_status := smoking_status,
      alcohol_status := alcohol_status)
      ORDER BY smoking_status, alcohol_status) AS exposures
  FROM read_csv('${FixtureDir}/exposure.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
sarr AS (
  SELECT study_id, [struct_pack(name := name, domain := domain,
    access_limitations := access_limitations,
    access_requirements := access_requirements,
    internal_notes := internal_notes)] AS study
  FROM study),
ph AS (
  SELECT *, phenotype_observed IN ('YES','Yes','yes','TRUE','True','true','Y','y','1') AS obs
  FROM read_csv('${FixtureDir}/phenotype.tsv', delim='\t', header=true, all_varchar=true)),
hpo AS (SELECT * FROM read_json_auto('${FixtureDir}/terms.jsonl.gz')),
ph_expanded AS (
  SELECT p.study_id, p.submitter_donor_id, p.obs, t.id AS term_id,
         t.name AS term_name, true AS is_tagged,
         coalesce(t.is_leaf, false) AS is_leaf, p.age_at_phenotype AS age
  FROM ph p JOIN hpo t ON p.phenotype_HPO_code = t.id
  UNION ALL
  SELECT p.study_id, p.submitter_donor_id, p.obs, anc.a.id, anc.a.name,
         false, false, p.age_at_phenotype
  FROM ph p JOIN hpo t ON p.phenotype_HPO_code = t.id,
       (SELECT unnest(t2.ancestors) AS a, t2.id AS tid FROM hpo t2) anc
  WHERE anc.tid = t.id),
ph_merged AS (
  SELECT study_id, submitter_donor_id, obs, term_id,
    min(term_name) AS term_name, bool_or(is_tagged) AS is_tagged,
    bool_or(is_leaf) AS is_leaf,
    list_sort(list_distinct(list(age))) AS vals
  FROM ph_expanded GROUP BY 1,2,3,4),
ph_nested AS (
  SELECT study_id, submitter_donor_id, obs,
    list(struct_pack(term_id := term_id, term_name := term_name,
      is_tagged := is_tagged, is_leaf := is_leaf, "values" := vals)
      ORDER BY term_id) AS phenos
  FROM ph_merged GROUP BY 1,2,3),
ph_piv AS (
  SELECT study_id, submitter_donor_id,
    any_value(phenos) FILTER (WHERE obs) AS observed_phenotypes,
    any_value(phenos) FILTER (WHERE NOT obs) AS non_observed_phenotypes
  FROM ph_nested GROUP BY 1,2),
diag AS (SELECT * FROM read_csv('${FixtureDir}/diagnosis.tsv', delim='\t', header=true, all_varchar=true)),
mondo AS (SELECT * FROM read_json_auto('${FixtureDir}/mondo_terms.jsonl.gz')),
icd AS (
  SELECT regexp_extract(id, '^(.*)\|([1-9]*)', 1) AS id, name, ancestors, is_leaf
  FROM read_json_auto('${FixtureDir}/icd_terms.jsonl.gz')),
mondo_mc AS (
  SELECT id, min(a.name || ' (' || a.id || ')') AS mc
  FROM (SELECT id, unnest(ancestors) AS a FROM mondo)
  WHERE list_contains(a.parents, 'disease or disorder (MONDO:0000001)')
  GROUP BY id),
icd_mc AS (
  SELECT id, min(a.name || ' (' || a.id || ')') AS mc
  FROM (SELECT id, unnest(ancestors) AS a FROM icd)
  WHERE regexp_matches(a.id, '^[A-Z][0-9]{2}-[A-Z][0-9]{2}')
  GROUP BY id),
trn AS (
  SELECT submitter_diagnosis_id,
    list(struct_pack(submitter_treatment_id := submitter_treatment_id,
      treatment_type := treatment_type, treatment_intent := treatment_intent)
      ORDER BY submitter_treatment_id, treatment_type, treatment_intent) AS treatments
  FROM read_csv('${FixtureDir}/treatment.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
fun AS (
  SELECT submitter_diagnosis_id,
    list(struct_pack(submitter_follow_up_id := submitter_follow_up_id,
      days_to_follow_up := days_to_follow_up, disease_status := disease_status)
      ORDER BY submitter_follow_up_id, days_to_follow_up, disease_status) AS follow_ups
  FROM read_csv('${FixtureDir}/follow_up.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
diag_nested AS (
  SELECT study_id, submitter_donor_id,
    list(struct_pack(
      submitter_diagnosis_id := d.submitter_diagnosis_id,
      diagnosis_mondo_code := diagnosis_mondo_code,
      diagnosis_ICD_code := diagnosis_ICD_code,
      age_at_diagnosis := age_at_diagnosis,
      is_cancer := is_cancer,
      mondo_main_category := m.mc,
      icd_main_category := i.mc,
      treatments := trn.treatments,
      follow_ups := fun.follow_ups) ORDER BY d.submitter_diagnosis_id) AS diagnoses
  FROM diag d
  LEFT JOIN mondo_mc m ON d.diagnosis_mondo_code = m.id
  LEFT JOIN icd_mc i ON d.diagnosis_ICD_code = i.id
  LEFT JOIN trn ON d.submitter_diagnosis_id = trn.submitter_diagnosis_id
  LEFT JOIN fun ON d.submitter_diagnosis_id = fun.submitter_diagnosis_id
  GROUP BY 1, 2),
mondo_expanded AS (
  SELECT p.study_id, p.submitter_donor_id, t.id AS term_id, t.name AS term_name,
         true AS is_tagged, coalesce(t.is_leaf, false) AS is_leaf,
         p.age_at_diagnosis AS age
  FROM diag p JOIN mondo t ON p.diagnosis_mondo_code = t.id
  UNION ALL
  SELECT p.study_id, p.submitter_donor_id, anc.a.id, anc.a.name, false, false,
         p.age_at_diagnosis
  FROM diag p JOIN mondo t ON p.diagnosis_mondo_code = t.id,
       (SELECT unnest(t2.ancestors) AS a, t2.id AS tid FROM mondo t2) anc
  WHERE anc.tid = t.id),
mondo_nested AS (
  SELECT study_id, submitter_donor_id,
    list(struct_pack(term_id := term_id, term_name := term_name,
      is_tagged := is_tagged, is_leaf := is_leaf, "values" := vals)
      ORDER BY term_id) AS mondo
  FROM (
    SELECT study_id, submitter_donor_id, term_id, min(term_name) AS term_name,
      bool_or(is_tagged) AS is_tagged, bool_or(is_leaf) AS is_leaf,
      list_sort(list_distinct(list(age))) AS vals
    FROM mondo_expanded GROUP BY 1,2,3)
  GROUP BY 1,2),
icd_expanded AS (
  SELECT p.study_id, p.submitter_donor_id, t.id AS term_id, t.name AS term_name,
         true AS is_tagged, coalesce(t.is_leaf, false) AS is_leaf,
         p.age_at_diagnosis AS age
  FROM diag p JOIN icd t ON p.diagnosis_ICD_code = t.id
  UNION ALL
  SELECT p.study_id, p.submitter_donor_id, anc.a.id, anc.a.name, false, false,
         p.age_at_diagnosis
  FROM diag p JOIN icd t ON p.diagnosis_ICD_code = t.id,
       (SELECT unnest(t2.ancestors) AS a, t2.id AS tid FROM icd t2) anc
  WHERE anc.tid = t.id),
icd_nested AS (
  SELECT study_id, submitter_donor_id,
    list(struct_pack(term_id := term_id, term_name := term_name,
      is_tagged := is_tagged, is_leaf := is_leaf, "values" := vals)
      ORDER BY term_id) AS icd
  FROM (
    SELECT study_id, submitter_donor_id, term_id, min(term_name) AS term_name,
      bool_or(is_tagged) AS is_tagged, bool_or(is_leaf) AS is_leaf,
      list_sort(list_distinct(list(age))) AS vals
    FROM icd_expanded GROUP BY 1,2,3)
  GROUP BY 1,2),
diag_exp AS (
  SELECT coalesce(m.study_id, i.study_id) AS study_id,
    coalesce(m.submitter_donor_id, i.submitter_donor_id) AS submitter_donor_id,
    m.mondo, i.icd
  FROM mondo_nested m
  FULL JOIN icd_nested i
    ON m.study_id = i.study_id AND m.submitter_donor_id = i.submitter_donor_id),
samples_nested AS (
  SELECT submitter_biospecimen_id,
    list(struct_pack(submitter_sample_id := submitter_sample_id,
      sample_type := sample_type)
      ORDER BY submitter_sample_id, sample_type) AS samples
  FROM read_csv('${FixtureDir}/sample_registration.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
bio AS (
  SELECT b.submitter_biospecimen_id,
    struct_pack(biospecimen_tissue_source := b.biospecimen_tissue_source,
      biospecimen_type := b.biospecimen_type, is_cancer := b.is_cancer,
      samples := coalesce(s.samples, [])) AS biospecimen
  FROM read_csv('${FixtureDir}/biospecimen.tsv', delim='\t', header=true, all_varchar=true) b
  LEFT JOIN samples_nested s ON b.submitter_biospecimen_id = s.submitter_biospecimen_id),
files_nested AS (
  SELECT f.study_id, f.submitter_donor_id,
    list(struct_pack(file_name := f.file_name, data_category := f.data_category,
      data_type := f.data_type, experimental_strategy := f.experimental_strategy,
      file_format := f.file_format, data_access := f.data_access,
      biospecimen := bio.biospecimen) ORDER BY f.file_name) AS files
  FROM read_csv('${FixtureDir}/file.tsv', delim='\t', header=true, all_varchar=true) f
  LEFT JOIN bio ON f.submitter_biospecimen_id = bio.submitter_biospecimen_id
  GROUP BY 1, 2)

, donors_nested AS (
  SELECT d.study_id,
    list(struct_pack(
      submitter_donor_id := d.submitter_donor_id, dob := d.dob,
      "age TODAY" := d."age TODAY", gender := d.gender,
      ethnicity := d.ethnicity, vital_status := d.vital_status,
      is_a_proband := d.is_a_proband,
      family_relationships := fam.family_relationships,
      family_conditions := fh.family_conditions,
      exposures := ex.exposures,
      observed_phenotypes := ph_piv.observed_phenotypes,
      non_observed_phenotypes := ph_piv.non_observed_phenotypes,
      diagnoses := dn.diagnoses,
      mondo := de.mondo,
      icd := de.icd) ORDER BY d.submitter_donor_id) AS donors
  FROM donor d
  LEFT JOIN fam ON d.submitter_donor_id = fam.submitter_donor_id
  LEFT JOIN fh ON d.submitter_donor_id = fh.submitter_donor_id
  LEFT JOIN ex ON d.submitter_donor_id = ex.submitter_donor_id
  LEFT JOIN ph_piv ON d.study_id = ph_piv.study_id AND d.submitter_donor_id = ph_piv.submitter_donor_id
  LEFT JOIN diag_nested dn ON d.study_id = dn.study_id AND d.submitter_donor_id = dn.submitter_donor_id
  LEFT JOIN diag_exp de ON d.study_id = de.study_id AND d.submitter_donor_id = de.submitter_donor_id
  GROUP BY 1),
study_files AS (
  SELECT f.study_id,
    list(struct_pack(file_name := f.file_name, data_category := f.data_category,
      experimental_strategy := f.experimental_strategy,
      data_access := f.data_access, biospecimen := bio.biospecimen)
      ORDER BY f.file_name) AS files,
    count(DISTINCT f.submitter_donor_id) AS nd
  FROM read_csv('${FixtureDir}/file.tsv', delim='	', header=true, all_varchar=true) f
  LEFT JOIN bio ON f.submitter_biospecimen_id = bio.submitter_biospecimen_id
  GROUP BY 1),
duo AS (SELECT id, name FROM read_json_auto('${FixtureDir}/duo_terms.jsonl.gz')),
dac AS (
  SELECT study_id,
    struct_pack(access_limitations := access_limitations,
      access_requirements := access_requirements) AS data_access_codes
  FROM (
    SELECT study_id, access_limitations,
      list(DISTINCT access_requirements ORDER BY access_requirements) AS access_requirements
    FROM (
      SELECT s.study_id,
        d1.name || ' (' || s.access_limitations || ')' AS access_limitations,
        d2.name || ' (' || trim(s.req) || ')' AS access_requirements
      FROM (SELECT study_id, access_limitations,
              unnest(string_split(access_requirements, ';')) AS req FROM study) s
      LEFT JOIN duo d1 ON s.access_limitations = d1.id
      LEFT JOIN duo d2 ON trim(s.req) = d2.id
      WHERE s.req IS NOT NULL AND trim(s.req) <> '')
    GROUP BY 1, 2)),
dpf AS (
  SELECT f.study_id, f.submitter_donor_id, f.file_name, f.data_category, f.experimental_strategy
  FROM read_csv('${FixtureDir}/file.tsv', delim='	', header=true, all_varchar=true) f
  JOIN donor USING (study_id, submitter_donor_id)),
studies_u AS (SELECT DISTINCT study_id FROM dpf),
dc_m AS (
  SELECT s.study_id, list(struct_pack(key := c.data_category,
      donors := coalesce(p.donors, 0), files := coalesce(p.files, 0))
      ORDER BY c.data_category) AS data_category
  FROM studies_u s
  CROSS JOIN (SELECT DISTINCT data_category FROM dpf) c
  LEFT JOIN (SELECT study_id, data_category,
        count(DISTINCT submitter_donor_id) AS donors,
        count(DISTINCT file_name) AS files FROM dpf GROUP BY 1,2) p
    ON s.study_id = p.study_id AND c.data_category = p.data_category
  GROUP BY 1),
es_m AS (
  SELECT s.study_id, list(struct_pack(key := c.experimental_strategy,
      donors := coalesce(p.donors, 0), files := coalesce(p.files, 0))
      ORDER BY c.experimental_strategy) AS experimental_strategy
  FROM studies_u s
  CROSS JOIN (SELECT DISTINCT experimental_strategy FROM dpf) c
  LEFT JOIN (SELECT study_id, experimental_strategy,
        count(DISTINCT submitter_donor_id) AS donors,
        count(DISTINCT file_name) AS files FROM dpf GROUP BY 1,2) p
    ON s.study_id = p.study_id AND c.experimental_strategy = p.experimental_strategy
  GROUP BY 1),
clin_m AS (
  SELECT study_id, list(struct_pack(key := key, donors := donors) ORDER BY key) AS cda
  FROM (SELECT study_id, key, count(DISTINCT submitter_donor_id) AS donors
    FROM (
      SELECT study_id, 'diagnosis' AS key, submitter_donor_id FROM diag
      UNION ALL SELECT study_id, 'phenotype', submitter_donor_id FROM ph
      UNION ALL SELECT study_id, 'treatment', submitter_donor_id
        FROM read_csv('${FixtureDir}/treatment.tsv', delim='	', header=true, all_varchar=true)
      UNION ALL SELECT study_id, 'exposure', submitter_donor_id
        FROM read_csv('${FixtureDir}/exposure.tsv', delim='	', header=true, all_varchar=true)
      UNION ALL SELECT study_id, 'follow_up', submitter_donor_id
        FROM read_csv('${FixtureDir}/follow_up.tsv', delim='	', header=true, all_varchar=true)
      UNION ALL SELECT study_id, 'family_history', submitter_donor_id
        FROM read_csv('${FixtureDir}/family_history.tsv', delim='	', header=true, all_varchar=true)
      UNION ALL SELECT study_id, 'family', submitter_donor_id
        FROM read_csv('${FixtureDir}/family.tsv', delim='	', header=true, all_varchar=true))
    GROUP BY 1, 2)
  GROUP BY 1)
SELECT st.study_id, st.name, st.domain, st.access_limitations,
  st.access_requirements, st.internal_notes,
  to_json(dns.donors) AS donors_json,
  to_json(sf.files) AS files_json,
  to_json(dac.data_access_codes) AS data_access_codes_json,
  to_json(struct_pack(
    data_category := coalesce(dc_m.data_category, []),
    experimental_strategy := coalesce(es_m.experimental_strategy, []),
    clinical_data_available := coalesce(clin_m.cda, []),
    n_donors := coalesce(len(dns.donors), 0),
    n_files := coalesce(len(sf.files), 0),
    n_donors_with_files := coalesce(sf.nd, 0))) AS summary_json,
  '9.9' AS dictionary_version, 'v42' AS study_version
FROM study st
LEFT JOIN donors_nested dns ON st.study_id = dns.study_id
LEFT JOIN study_files sf ON st.study_id = sf.study_id
LEFT JOIN dac ON st.study_id = dac.study_id
LEFT JOIN dc_m ON st.study_id = dc_m.study_id
LEFT JOIN es_m ON st.study_id = es_m.study_id
LEFT JOIN clin_m ON st.study_id = clin_m.study_id"""

  val fileIndexSql: String = raw"""WITH donor AS (SELECT * FROM read_csv('${FixtureDir}/donor.tsv', delim='\t', header=true, all_varchar=true)),
study AS (SELECT * FROM read_csv('${FixtureDir}/study.tsv', delim='\t', header=true, all_varchar=true)),
fam AS (
  SELECT submitter_donor_id,
    list(struct_pack(submitter_family_id := submitter_family_id,
      family_type := family_type,
      relationship_to_proband := relationship_to_proband)
      ORDER BY submitter_family_id, family_type, relationship_to_proband)
      AS family_relationships
  FROM read_csv('${FixtureDir}/family.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
fh AS (
  SELECT submitter_donor_id,
    list(struct_pack(
      submitter_family_condition_id := submitter_family_condition_id,
      family_condition_name := family_condition_name,
      family_condition_age := family_condition_age,
      family_condition_relationship := family_condition_relationship)
      ORDER BY submitter_family_condition_id) AS family_conditions
  FROM read_csv('${FixtureDir}/family_history.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
ex AS (
  SELECT submitter_donor_id,
    list(struct_pack(smoking_status := smoking_status,
      alcohol_status := alcohol_status)
      ORDER BY smoking_status, alcohol_status) AS exposures
  FROM read_csv('${FixtureDir}/exposure.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
sarr AS (
  SELECT study_id, [struct_pack(name := name, domain := domain,
    access_limitations := access_limitations,
    access_requirements := access_requirements,
    internal_notes := internal_notes)] AS study
  FROM study),
ph AS (
  SELECT *, phenotype_observed IN ('YES','Yes','yes','TRUE','True','true','Y','y','1') AS obs
  FROM read_csv('${FixtureDir}/phenotype.tsv', delim='\t', header=true, all_varchar=true)),
hpo AS (SELECT * FROM read_json_auto('${FixtureDir}/terms.jsonl.gz')),
ph_expanded AS (
  SELECT p.study_id, p.submitter_donor_id, p.obs, t.id AS term_id,
         t.name AS term_name, true AS is_tagged,
         coalesce(t.is_leaf, false) AS is_leaf, p.age_at_phenotype AS age
  FROM ph p JOIN hpo t ON p.phenotype_HPO_code = t.id
  UNION ALL
  SELECT p.study_id, p.submitter_donor_id, p.obs, anc.a.id, anc.a.name,
         false, false, p.age_at_phenotype
  FROM ph p JOIN hpo t ON p.phenotype_HPO_code = t.id,
       (SELECT unnest(t2.ancestors) AS a, t2.id AS tid FROM hpo t2) anc
  WHERE anc.tid = t.id),
ph_merged AS (
  SELECT study_id, submitter_donor_id, obs, term_id,
    min(term_name) AS term_name, bool_or(is_tagged) AS is_tagged,
    bool_or(is_leaf) AS is_leaf,
    list_sort(list_distinct(list(age))) AS vals
  FROM ph_expanded GROUP BY 1,2,3,4),
ph_nested AS (
  SELECT study_id, submitter_donor_id, obs,
    list(struct_pack(term_id := term_id, term_name := term_name,
      is_tagged := is_tagged, is_leaf := is_leaf, "values" := vals)
      ORDER BY term_id) AS phenos
  FROM ph_merged GROUP BY 1,2,3),
ph_piv AS (
  SELECT study_id, submitter_donor_id,
    any_value(phenos) FILTER (WHERE obs) AS observed_phenotypes,
    any_value(phenos) FILTER (WHERE NOT obs) AS non_observed_phenotypes
  FROM ph_nested GROUP BY 1,2),
diag AS (SELECT * FROM read_csv('${FixtureDir}/diagnosis.tsv', delim='\t', header=true, all_varchar=true)),
mondo AS (SELECT * FROM read_json_auto('${FixtureDir}/mondo_terms.jsonl.gz')),
icd AS (
  SELECT regexp_extract(id, '^(.*)\|([1-9]*)', 1) AS id, name, ancestors, is_leaf
  FROM read_json_auto('${FixtureDir}/icd_terms.jsonl.gz')),
mondo_mc AS (
  SELECT id, min(a.name || ' (' || a.id || ')') AS mc
  FROM (SELECT id, unnest(ancestors) AS a FROM mondo)
  WHERE list_contains(a.parents, 'disease or disorder (MONDO:0000001)')
  GROUP BY id),
icd_mc AS (
  SELECT id, min(a.name || ' (' || a.id || ')') AS mc
  FROM (SELECT id, unnest(ancestors) AS a FROM icd)
  WHERE regexp_matches(a.id, '^[A-Z][0-9]{2}-[A-Z][0-9]{2}')
  GROUP BY id),
trn AS (
  SELECT submitter_diagnosis_id,
    list(struct_pack(submitter_treatment_id := submitter_treatment_id,
      treatment_type := treatment_type, treatment_intent := treatment_intent)
      ORDER BY submitter_treatment_id, treatment_type, treatment_intent) AS treatments
  FROM read_csv('${FixtureDir}/treatment.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
fun AS (
  SELECT submitter_diagnosis_id,
    list(struct_pack(submitter_follow_up_id := submitter_follow_up_id,
      days_to_follow_up := days_to_follow_up, disease_status := disease_status)
      ORDER BY submitter_follow_up_id, days_to_follow_up, disease_status) AS follow_ups
  FROM read_csv('${FixtureDir}/follow_up.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
diag_nested AS (
  SELECT study_id, submitter_donor_id,
    list(struct_pack(
      submitter_diagnosis_id := d.submitter_diagnosis_id,
      diagnosis_mondo_code := diagnosis_mondo_code,
      diagnosis_ICD_code := diagnosis_ICD_code,
      age_at_diagnosis := age_at_diagnosis,
      is_cancer := is_cancer,
      mondo_main_category := m.mc,
      icd_main_category := i.mc,
      treatments := trn.treatments,
      follow_ups := fun.follow_ups) ORDER BY d.submitter_diagnosis_id) AS diagnoses
  FROM diag d
  LEFT JOIN mondo_mc m ON d.diagnosis_mondo_code = m.id
  LEFT JOIN icd_mc i ON d.diagnosis_ICD_code = i.id
  LEFT JOIN trn ON d.submitter_diagnosis_id = trn.submitter_diagnosis_id
  LEFT JOIN fun ON d.submitter_diagnosis_id = fun.submitter_diagnosis_id
  GROUP BY 1, 2),
mondo_expanded AS (
  SELECT p.study_id, p.submitter_donor_id, t.id AS term_id, t.name AS term_name,
         true AS is_tagged, coalesce(t.is_leaf, false) AS is_leaf,
         p.age_at_diagnosis AS age
  FROM diag p JOIN mondo t ON p.diagnosis_mondo_code = t.id
  UNION ALL
  SELECT p.study_id, p.submitter_donor_id, anc.a.id, anc.a.name, false, false,
         p.age_at_diagnosis
  FROM diag p JOIN mondo t ON p.diagnosis_mondo_code = t.id,
       (SELECT unnest(t2.ancestors) AS a, t2.id AS tid FROM mondo t2) anc
  WHERE anc.tid = t.id),
mondo_nested AS (
  SELECT study_id, submitter_donor_id,
    list(struct_pack(term_id := term_id, term_name := term_name,
      is_tagged := is_tagged, is_leaf := is_leaf, "values" := vals)
      ORDER BY term_id) AS mondo
  FROM (
    SELECT study_id, submitter_donor_id, term_id, min(term_name) AS term_name,
      bool_or(is_tagged) AS is_tagged, bool_or(is_leaf) AS is_leaf,
      list_sort(list_distinct(list(age))) AS vals
    FROM mondo_expanded GROUP BY 1,2,3)
  GROUP BY 1,2),
icd_expanded AS (
  SELECT p.study_id, p.submitter_donor_id, t.id AS term_id, t.name AS term_name,
         true AS is_tagged, coalesce(t.is_leaf, false) AS is_leaf,
         p.age_at_diagnosis AS age
  FROM diag p JOIN icd t ON p.diagnosis_ICD_code = t.id
  UNION ALL
  SELECT p.study_id, p.submitter_donor_id, anc.a.id, anc.a.name, false, false,
         p.age_at_diagnosis
  FROM diag p JOIN icd t ON p.diagnosis_ICD_code = t.id,
       (SELECT unnest(t2.ancestors) AS a, t2.id AS tid FROM icd t2) anc
  WHERE anc.tid = t.id),
icd_nested AS (
  SELECT study_id, submitter_donor_id,
    list(struct_pack(term_id := term_id, term_name := term_name,
      is_tagged := is_tagged, is_leaf := is_leaf, "values" := vals)
      ORDER BY term_id) AS icd
  FROM (
    SELECT study_id, submitter_donor_id, term_id, min(term_name) AS term_name,
      bool_or(is_tagged) AS is_tagged, bool_or(is_leaf) AS is_leaf,
      list_sort(list_distinct(list(age))) AS vals
    FROM icd_expanded GROUP BY 1,2,3)
  GROUP BY 1,2),
diag_exp AS (
  SELECT coalesce(m.study_id, i.study_id) AS study_id,
    coalesce(m.submitter_donor_id, i.submitter_donor_id) AS submitter_donor_id,
    m.mondo, i.icd
  FROM mondo_nested m
  FULL JOIN icd_nested i
    ON m.study_id = i.study_id AND m.submitter_donor_id = i.submitter_donor_id),
samples_nested AS (
  SELECT submitter_biospecimen_id,
    list(struct_pack(submitter_sample_id := submitter_sample_id,
      sample_type := sample_type)
      ORDER BY submitter_sample_id, sample_type) AS samples
  FROM read_csv('${FixtureDir}/sample_registration.tsv', delim='\t', header=true, all_varchar=true)
  GROUP BY 1),
bio AS (
  SELECT b.submitter_biospecimen_id,
    struct_pack(biospecimen_tissue_source := b.biospecimen_tissue_source,
      biospecimen_type := b.biospecimen_type, is_cancer := b.is_cancer,
      samples := coalesce(s.samples, [])) AS biospecimen
  FROM read_csv('${FixtureDir}/biospecimen.tsv', delim='\t', header=true, all_varchar=true) b
  LEFT JOIN samples_nested s ON b.submitter_biospecimen_id = s.submitter_biospecimen_id),
files_nested AS (
  SELECT f.study_id, f.submitter_donor_id,
    list(struct_pack(file_name := f.file_name, data_category := f.data_category,
      data_type := f.data_type, experimental_strategy := f.experimental_strategy,
      file_format := f.file_format, data_access := f.data_access,
      biospecimen := bio.biospecimen) ORDER BY f.file_name) AS files
  FROM read_csv('${FixtureDir}/file.tsv', delim='\t', header=true, all_varchar=true) f
  LEFT JOIN bio ON f.submitter_biospecimen_id = bio.submitter_biospecimen_id
  GROUP BY 1, 2)

, donor_struct AS (
  SELECT d.study_id, d.submitter_donor_id,
    struct_pack(
      submitter_donor_id := d.submitter_donor_id, dob := d.dob,
      "age TODAY" := d."age TODAY", gender := d.gender,
      ethnicity := d.ethnicity, vital_status := d.vital_status,
      is_a_proband := d.is_a_proband,
      observed_phenotypes := ph_piv.observed_phenotypes,
      non_observed_phenotypes := ph_piv.non_observed_phenotypes,
      diagnoses := dn.diagnoses) AS donor
  FROM donor d
  LEFT JOIN ph_piv ON d.study_id = ph_piv.study_id AND d.submitter_donor_id = ph_piv.submitter_donor_id
  LEFT JOIN diag_nested dn ON d.study_id = dn.study_id AND d.submitter_donor_id = dn.submitter_donor_id)
SELECT f.study_id, f.submitter_donor_id, f.submitter_biospecimen_id,
  f.file_name, f.data_category, f.data_type, f.experimental_strategy,
  f.file_format, f.data_access,
  to_json(bio.biospecimen) AS biospecimen_json,
  to_json(sarr.study) AS study_json,
  to_json(ds.donor) AS donor_json,
  '9.9' AS dictionary_version, 'v42' AS study_version
FROM read_csv('${FixtureDir}/file.tsv', delim='	', header=true, all_varchar=true) f
LEFT JOIN bio ON f.submitter_biospecimen_id = bio.submitter_biospecimen_id
LEFT JOIN sarr ON f.study_id = sarr.study_id
LEFT JOIN donor_struct ds ON f.study_id = ds.study_id
  AND f.submitter_donor_id = ds.submitter_donor_id"""
}
