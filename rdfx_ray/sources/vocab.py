"""Closed entity vocabulary for the synthetic interleaved corpus.

Everything is a pure function of (seed, entity index) so generation,
extraction goldens, and the entity-linking dictionary all derive the
same facts independently — mirroring the reference corpus's Person
graph shape (/root/reference/tests/data/file_01.ttl: orcid subject,
sdo:Person, name/jobTitle/affiliation/email^^xsd:anyURI).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

SDO = "https://schema.org/"
XSD_ANYURI = "http://www.w3.org/2001/XMLSchema#anyURI"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

FIRST_NAMES = [
    "Alice", "Benjamin", "Clara", "Daniel", "Elena", "Felix", "Grace",
    "Hugo", "Iris", "Jonas", "Katherine", "Liam", "Mara", "Noah",
    "Olivia", "Patrick", "Quinn", "Rosa", "Stefan", "Tara", "Ulrich",
    "Vera", "William", "Xenia", "Yusuf", "Zoe",
]
LAST_NAMES = [
    "Anderson", "Bergmann", "Castillo", "Dupont", "Eriksen", "Fischer",
    "Gallagher", "Hernandez", "Ivanov", "Johansson", "Kowalski",
    "Lindqvist", "Moreau", "Nakamura", "Okafor", "Petrov", "Quintana",
    "Rossi", "Schneider", "Takahashi", "Umarov", "Varga", "Weber",
    "Xiang", "Yamamoto", "Zimmermann",
]
JOB_TITLES = [
    "Data Systems Architect", "Applications Architect", "Programmer",
    "Research Scientist", "Knowledge Engineer", "Site Reliability Engineer",
    "Product Manager", "Taxonomist", "Cartographer", "Data Steward",
    "Machine Learning Engineer", "Ontologist", "Archivist",
    "Systems Analyst", "Technical Writer", "Platform Engineer",
]
ORG_WORDS = [
    "Austral", "Boreal", "Cirrus", "Delta", "Ember", "Fathom", "Granite",
    "Harbor", "Isthmus", "Juniper", "Keystone", "Lumen", "Meridian",
    "Nimbus", "Orchid", "Pinnacle",
]
ORG_KINDS = ["Labs", "Institute", "Systems", "Collective"]

N_ORGS = 64

# mention kinds a text span can carry
SPAN_CLASSES = {
    "text": SDO + "Text",
    "image": SDO + "ImageObject",
    "audio": SDO + "AudioObject",
    "video": SDO + "VideoObject",
    "table": SDO + "Table",
}


def person_iri(k: int) -> str:
    # orcid-style ids; the reference's three test subjects are
    # ...7730/31/32 (tests/data/file_01.ttl:5, file_02.rdf:6)
    return f"http://orcid.org/0000-0002-8742-{7730 + k}"


def org_iri(j: int) -> str:
    return f"https://org-{j:03d}.example.com"


def org_name(j: int) -> str:
    return f"{ORG_WORDS[j % len(ORG_WORDS)]} {ORG_KINDS[(j // len(ORG_WORDS)) % len(ORG_KINDS)]} {j:03d}"


def person_name(k: int) -> str:
    first = FIRST_NAMES[k % len(FIRST_NAMES)]
    last = LAST_NAMES[(k // len(FIRST_NAMES)) % len(LAST_NAMES)]
    return f"{first} {last}-{k:05d}"


def person_attrs(k: int) -> Dict[str, str]:
    j = k % N_ORGS
    name = person_name(k)
    first, last_tag = name.split(" ", 1)
    return {
        "iri": person_iri(k),
        "name": name,
        "job_title": JOB_TITLES[k % len(JOB_TITLES)],
        "org_iri": org_iri(j),
        "org_name": org_name(j),
        "email": f"{first.lower()}.{last_tag.lower().replace('-', '.')}@org-{j:03d}.example.com",
    }


def mention_sentence(k: int) -> str:
    a = person_attrs(k)
    return (f"{a['name']} is a {a['job_title']} at {a['org_name']}. "
            f"Email: {a['email']}.")


def entity_triples(k: int) -> List[Tuple[str, str, str, str, str, str]]:
    """The five attribute triples for person k, decomposed columnar
    form (subj, pred, obj_kind, obj_value, obj_datatype, obj_lang)."""
    a = person_attrs(k)
    s = a["iri"]
    return [
        (s, RDF_TYPE, "iri", SDO + "Person", None, None),
        (s, SDO + "name", "literal", a["name"], None, None),
        (s, SDO + "jobTitle", "literal", a["job_title"], None, None),
        (s, SDO + "affiliation", "iri", a["org_iri"], None, None),
        (s, SDO + "email", "literal", a["email"], XSD_ANYURI, None),
    ]


def build_alias_index(n_entities: int) -> Dict[str, int]:
    """name → entity index; the broadcast side input the linker actor
    loads once per actor (SURVEY.md §2.5 'entity-linking dictionary')."""
    return {person_name(k): k for k in range(n_entities)}
