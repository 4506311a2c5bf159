"""Binary-format parsers exercised against REAL generated documents
(round-1 verdict item 4: the PDF/DOCX/XLSX paths were gated and never
run on actual binaries; ODT/ODS had no parser at all)."""

import pytest

from fixture_docs import (
    make_docx,
    make_ods,
    make_odt,
    make_pdf,
    make_scanned_pdf,
    make_xlsx,
)
from rag_dpo_tpu.ingest.chunker import StructuralChunker
from rag_dpo_tpu.ingest.parsing import parse_document, supported_formats


def test_all_formats_registered():
    for fmt in ("pdf", "docx", "xlsx", "odt", "ods", "html", "txt", "md"):
        assert fmt in supported_formats(), fmt


# ---------------------------------------------------------------- docx

def test_docx_sections_and_table():
    sections = parse_document(make_docx(), "docx")
    assert len(sections) == 2
    s1, s2 = sections
    assert s1.heading == "Obligations du responsable de traitement"
    assert s1.level == 1
    assert "registre des activités" in s1.text
    assert "coopère" in s1.text
    assert s2.heading == "Délais de notification"
    assert s2.level == 2
    assert "72 heures" in s2.text
    assert len(s2.tables) == 1  # table attached to ITS section, in order
    t = s2.tables[0]
    assert t.headers == ["Obligation", "Délai"]
    assert t.rows == [["Notification CNIL", "72 heures"],
                      ["Information des personnes", "sans délai"]]


# ---------------------------------------------------------------- xlsx

def test_xlsx_zone_segmentation():
    sections = parse_document(make_xlsx(), "xlsx")
    assert len(sections) == 2  # blank row 4 splits the sheet in two
    z1, z2 = sections
    assert z1.heading == "Registre — zone 1"
    assert z1.tables[0].headers == ["Traitement", "Base légale"]
    assert z1.tables[0].rows == [["Paie", "Obligation légale"],
                                 ["Prospection", "Consentement"]]
    assert z2.tables[0].headers == ["Registre", "Statut"]
    assert z2.tables[0].rows == [["Paie RH", "À jour"]]


# ------------------------------------------------------------ odt / ods

def test_odt_sections_and_table():
    sections = parse_document(make_odt(), "odt")
    assert [s.heading for s in sections] == ["Analyse d'impact",
                                             "Critères"]
    assert "risque élevé" in sections[0].text
    assert sections[1].tables[0].headers == ["Critère", "Exemple"]
    assert sections[1].tables[0].rows == [["Surveillance", "Vidéo"]]


def test_ods_zones():
    sections = parse_document(make_ods(), "ods")
    assert len(sections) == 2
    assert sections[0].tables[0].headers == ["Prestataire", "Pays"]
    assert sections[1].tables[0].rows == [["DPO externe",
                                           "dpo@exemple.fr"]]


# ----------------------------------------------------------------- pdf

def test_pdf_text_headings_and_pages():
    sections = parse_document(make_pdf(), "pdf")
    headings = [s.heading for s in sections]
    assert "Sanctions de la CNIL" in headings
    assert "Procedure de controle" in headings
    s1 = sections[headings.index("Sanctions de la CNIL")]
    assert "20 millions" in s1.text
    assert "chiffre d'affaires" in s1.text
    assert s1.page_info == "p.1"
    s2 = sections[headings.index("Procedure de controle")]
    assert "sur place et en ligne" in s2.text  # TJ array operator
    assert s2.page_info == "p.2"


def test_pdf_outline_titles():
    from rag_dpo_tpu.ingest.pdf import outline_titles

    titles = outline_titles(make_pdf())
    assert "Sanctions de la CNIL" in titles
    assert "Procedure de controle" in titles


def test_scanned_pdf_without_vision_yields_nothing():
    assert parse_document(make_scanned_pdf(), "pdf") == []


def test_scanned_pdf_vision_fallback():
    calls = []

    def fake_vision(pdf_bytes, page_index):
        calls.append(page_index)
        return ("Schéma des acteurs RGPD : responsable de traitement, "
                "sous-traitant et personnes concernées.")

    sections = parse_document(make_scanned_pdf(), "pdf",
                              vision=fake_vision)
    assert calls == [0]
    assert len(sections) == 1
    assert "Schéma des acteurs" in sections[0].text
    assert "(vision)" in sections[0].page_info


def test_text_pdf_never_calls_vision():
    def explode(pdf_bytes, page_index):  # pragma: no cover
        raise AssertionError("vision must not run on text PDFs")

    sections = parse_document(make_pdf(), "pdf", vision=explode)
    assert sections


# ----------------------------------------------- end-to-end via chunker

@pytest.mark.parametrize("builder,fmt", [
    (make_docx, "docx"), (make_xlsx, "xlsx"),
    (make_odt, "odt"), (make_ods, "ods"), (make_pdf, "pdf"),
])
def test_chunker_end_to_end(builder, fmt):
    sections = parse_document(builder(), fmt)
    chunks = StructuralChunker().chunk_sections(sections, f"doc_{fmt}")
    assert chunks, fmt
    for c in chunks:
        assert c.chunk_id.startswith(f"doc_{fmt}")
        assert c.text.strip()


def test_corrupt_office_files_raise_value_error():
    """Parser contract: unparseable bytes raise ValueError (what the
    per-document pipeline loop catches) — never BadZipFile."""
    import pytest

    from rag_dpo_tpu.ingest.office import (
        parse_docx,
        parse_ods,
        parse_odt,
        parse_xlsx,
    )

    for fn in (parse_docx, parse_xlsx, parse_odt, parse_ods):
        with pytest.raises(ValueError, match="unparseable"):
            fn(b"PK\x03\x04 truncated zip")
        with pytest.raises(ValueError, match="unparseable"):
            fn(b"not a zip at all")


def test_corrupt_pdf_returns_empty_not_raises():
    from rag_dpo_tpu.ingest.pdf import parse_pdf

    assert parse_pdf(b"%PDF-1.4 garbage\x00\x01") == []
    assert parse_pdf(b"") == []
