"""GDPR/CNIL acronym expansion (host-side query preprocessing).

Role parity with the reference's acronym dictionary + inline expansion
(`src/utils/acronyms.py:6-198`): queries containing known acronyms get the
expanded form appended so both dense and lexical arms can match documents
that spell terms out. The dictionary below is standard French
data-protection vocabulary (independent compilation).
"""

from __future__ import annotations

import re

ACRONYMS: dict[str, str] = {
    "rgpd": "règlement général sur la protection des données",
    "gdpr": "règlement général sur la protection des données",
    "cnil": "commission nationale de l'informatique et des libertés",
    "dpo": "délégué à la protection des données",
    "dpd": "délégué à la protection des données",
    "aipd": "analyse d'impact relative à la protection des données",
    "pia": "analyse d'impact relative à la protection des données",
    "dpia": "analyse d'impact relative à la protection des données",
    "bcr": "règles d'entreprise contraignantes",
    "cct": "clauses contractuelles types",
    "scc": "clauses contractuelles types",
    "cepd": "comité européen de la protection des données",
    "edpb": "comité européen de la protection des données",
    "edps": "contrôleur européen de la protection des données",
    "dcp": "données à caractère personnel",
    "rt": "responsable de traitement",
    "st": "sous-traitant",
    "dsi": "direction des systèmes d'information",
    "rssi": "responsable de la sécurité des systèmes d'information",
    "ssi": "sécurité des systèmes d'information",
    "pssi": "politique de sécurité des systèmes d'information",
    "anssi": "agence nationale de la sécurité des systèmes d'information",
    "nis": "directive sur la sécurité des réseaux et des systèmes d'information",
    "nis2": "directive sur la sécurité des réseaux et des systèmes d'information",
    "lil": "loi informatique et libertés",
    "cada": "commission d'accès aux documents administratifs",
    "cjue": "cour de justice de l'union européenne",
    "dma": "règlement sur les marchés numériques",
    "dsa": "règlement sur les services numériques",
    "ia": "intelligence artificielle",
    "rh": "ressources humaines",
    "sirh": "système d'information de gestion des ressources humaines",
    "crm": "gestion de la relation client",
    "erp": "progiciel de gestion intégré",
    "vpn": "réseau privé virtuel",
    "api": "interface de programmation",
    "sso": "authentification unique",
    "mfa": "authentification multifacteur",
    "2fa": "authentification à deux facteurs",
    "dlp": "prévention des fuites de données",
    "siem": "gestion des informations et des événements de sécurité",
    "edr": "détection et réponse sur les terminaux",
    "saas": "logiciel en tant que service",
    "paas": "plateforme en tant que service",
    "iaas": "infrastructure en tant que service",
    "cloud": "informatique en nuage",
    "cookies": "traceurs de navigation",
    "opt-in": "consentement préalable",
    "opt-out": "droit d'opposition",
    "kyc": "connaissance client",
    "lcb-ft": "lutte contre le blanchiment et le financement du terrorisme",
    "hds": "hébergeur de données de santé",
    "ehpad": "établissement d'hébergement pour personnes âgées dépendantes",
    "cse": "comité social et économique",
    "ccas": "centre communal d'action sociale",
    "ars": "agence régionale de santé",
    "cpam": "caisse primaire d'assurance maladie",
    "urssaf": "union de recouvrement des cotisations de sécurité sociale",
    "insee": "institut national de la statistique",
    "nir": "numéro d'inscription au répertoire national",
    "rcp": "registre des activités de traitement",
    "ropa": "registre des activités de traitement",
    "dsp2": "directive sur les services de paiement",
    "pca": "plan de continuité d'activité",
    "pra": "plan de reprise d'activité",
    "tia": "évaluation des transferts internationaux",
    "dtia": "évaluation des transferts internationaux de données",
}

_METHOD_HINTS = {
    "aipd": "méthodologie analyse d'impact étapes",
    "pia": "méthodologie analyse d'impact étapes",
    "dpia": "méthodologie analyse d'impact étapes",
}


def expand_acronyms(query: str) -> str:
    """Append expansions for acronyms present in the query (word-boundary
    match, case-insensitive). Methodology acronyms additionally pull in
    process keywords (the reference enriches AIPD queries the same way)."""
    additions: list[str] = []
    low = query.lower()
    for acro, full in ACRONYMS.items():
        if re.search(rf"\b{re.escape(acro)}\b", low):
            if full not in low:
                additions.append(full)
            hint = _METHOD_HINTS.get(acro)
            if hint:
                additions.append(hint)
    if not additions:
        return query
    # dedup, keep order
    seen: set[str] = set()
    uniq = [a for a in additions if not (a in seen or seen.add(a))]
    return f"{query} ({'; '.join(uniq)})"
