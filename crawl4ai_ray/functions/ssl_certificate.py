"""SSL certificate capture at the fetch seam.

Re-expresses the reference's ``SSLCertificate``
(crawl4ai/ssl_certificate.py:13-204): a dict-subclass (directly JSON
serializable) carrying subject/issuer/validity/fingerprint plus
PEM/DER export, surfaced on the crawl response
(crawl4ai/models.py:150, :341 — ``ssl_certificate`` field, populated
when ``fetch_ssl_certificate`` is set on the run config).

The sandbox has no sockets and no OpenSSL, so the live TLS handshake
of ``SSLCertificate.from_url`` (ssl_certificate.py:62-133) is
replaced by a deterministic per-host synthetic certificate: every
field is a pure function of the host string, and the "DER" payload
is a canonical byte string (not ASN.1 — no encoder in this
container; the schema/plumbing, not the encoding, is the engine
surface). ``fingerprint`` is the real sha256 of that payload, so the
field relationships (fingerprint == sha256(raw der), PEM ==
base64-wrapped DER) hold exactly as in the reference and are
SQL-mirrorable for the correctness oracle.
"""

from __future__ import annotations

import base64
import hashlib
import json
from typing import Any, Dict, Optional

NOT_BEFORE = "20240101000000Z"  # ASN.1 GENERALIZEDTIME, fixed epoch
_ALG = "sha256WithRSAEncryption"


class SSLCertificate(dict):
    """Dict-backed certificate record (reference
    ssl_certificate.py:13-39: inherits dict for direct JSON
    serialization; property accessors read the dict)."""

    def __init__(self, cert_info: Dict[str, Any]):
        super().__init__(self._decode(cert_info))

    @staticmethod
    def _decode(data: Any) -> Any:
        """bytes -> str, recursively (reference :41-59)."""
        if isinstance(data, bytes):
            try:
                return data.decode("utf-8")
            except UnicodeDecodeError:
                return data.decode("latin-1")
        if isinstance(data, dict):
            return {
                (k.decode("utf-8") if isinstance(k, bytes) else k): SSLCertificate._decode(v)
                for k, v in data.items()
            }
        if isinstance(data, list):
            return [SSLCertificate._decode(v) for v in data]
        return data

    # -- property surface (reference :137-155) --------------------------
    @property
    def issuer(self) -> Dict[str, str]:
        return self.get("issuer", {})

    @property
    def subject(self) -> Dict[str, str]:
        return self.get("subject", {})

    @property
    def valid_from(self) -> str:
        return self.get("not_before", "")

    @property
    def valid_until(self) -> str:
        return self.get("not_after", "")

    @property
    def fingerprint(self) -> str:
        return self.get("fingerprint", "")

    # -- exports (reference :158-198) ------------------------------------
    def to_json(self, filepath: Optional[str] = None) -> Optional[str]:
        s = json.dumps(self, indent=2, ensure_ascii=False)
        if filepath:
            with open(filepath, "w", encoding="utf-8") as f:
                f.write(s)
            return None
        return s

    def to_der(self, filepath: Optional[str] = None) -> Optional[bytes]:
        der = base64.b64decode(self.get("raw_cert", ""))
        if filepath:
            with open(filepath, "wb") as f:
                f.write(der)
            return None
        return der

    def to_pem(self, filepath: Optional[str] = None) -> Optional[str]:
        """PEM is base64(DER) in 64-char lines between CERTIFICATE
        guards — stdlib-expressible, no OpenSSL round-trip needed."""
        b64 = base64.b64encode(self.to_der()).decode("ascii")
        body = "\n".join(b64[i : i + 64] for i in range(0, len(b64), 64))
        pem = f"-----BEGIN CERTIFICATE-----\n{body}\n-----END CERTIFICATE-----\n"
        if filepath:
            with open(filepath, "w", encoding="utf-8") as f:
                f.write(pem)
            return None
        return pem

    def __repr__(self) -> str:  # reference :201-204
        return (
            f"<SSLCertificate Subject='{self.subject.get('CN', 'N/A')}' "
            f"Issuer='{self.issuer.get('CN', 'N/A')}'>"
        )


def synth_cert_fields(host: str) -> dict:
    """The deterministic, SQL-mirrorable per-host cert scalar fields.

    Every value is a pure function of ``host`` using only operations
    DuckDB can replay (string concat, length, substr, sha256), so the
    correctness oracle recomputes the whole row — including the
    fingerprint — in SQL (pipelines/oracles.py ``ssl_certificates``).
    """
    subject = f"CN={host}"
    issuer = f"CN=Synthetic Root CA {len(host) % 4}"
    serial = "0x" + hashlib.sha256(f"serial:{host}".encode("utf-8")).hexdigest()[:16]
    not_after = f"{2025 + len(host) % 3}0101000000Z"
    der = (
        f"SYNTHCERT:v1:{subject}:issuer={issuer}:serial={serial}"
        f":nb={NOT_BEFORE}:na={not_after}:alg={_ALG}"
    ).encode("utf-8")
    return {
        "subject": subject,
        "issuer": issuer,
        "serial_number": serial,
        "not_before": NOT_BEFORE,
        "not_after": not_after,
        "fingerprint": hashlib.sha256(der).hexdigest(),
        "der": der,
    }


def synth_host_cert(host: str) -> SSLCertificate:
    """Full SSLCertificate for a host, field-for-field shaped like the
    reference's ``cert_info_raw`` (ssl_certificate.py:91-111)."""
    f = synth_cert_fields(host)
    return SSLCertificate(
        {
            "subject": {"CN": host},
            "issuer": {
                "CN": f"Synthetic Root CA {len(host) % 4}",
                "O": "Crawl4AI-Ray Synthetic PKI",
            },
            "version": 2,  # X.509 v3 is encoded as version 2
            "serial_number": f["serial_number"],
            "not_before": f["not_before"],
            "not_after": f["not_after"],
            "fingerprint": f["fingerprint"],
            "signature_algorithm": _ALG,
            "raw_cert": base64.b64encode(f["der"]),
            "extensions": [
                {"name": "subjectAltName", "value": f"DNS:{host}"},
                {"name": "basicConstraints", "value": "CA:FALSE"},
            ],
        }
    )


# columns appended by the fetch seam when fetch_ssl is enabled
SSL_COLUMNS = (
    "ssl_subject",
    "ssl_issuer",
    "ssl_serial_number",
    "ssl_not_before",
    "ssl_not_after",
    "ssl_fingerprint",
)


def ssl_columns_for_hosts(hosts) -> dict:
    """Vectorized per-row cert columns for a host list: certs are
    computed once per UNIQUE host (per-batch memo; the fetch actor
    also caches across batches) and gathered back by inverse index."""
    import numpy as np

    arr = np.asarray(hosts, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    fields = [synth_cert_fields(h) for h in uniq]
    out = {}
    for col, key in zip(
        SSL_COLUMNS,
        ("subject", "issuer", "serial_number", "not_before", "not_after", "fingerprint"),
    ):
        vals = np.asarray([f[key] for f in fields], dtype=object)
        out[col] = vals[inv].tolist()
    return out
