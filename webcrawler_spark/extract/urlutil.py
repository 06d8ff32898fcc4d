"""Go net/url parity helpers (reference: utils.go, extractor.go link handling).

Semantics pinned to the Go code:

- ``build_full_url``  — utils.go:23-33  (case-sensitive scheme prefix check,
  prepend ``https://`` when missing)
- ``get_domain``      — utils.go:11-20  (Hostname() minus leading ``www.``)
- ``resolve``         — url.URL.ResolveReference (RFC 3986, same as urljoin)
- ``host``            — url.URL.Host: host[:port], userinfo stripped, case
  preserved (Python's ``.hostname`` would lowercase — deliberately not used)
- ``hostname``        — url.URL.Hostname(): Host minus port/brackets, case
  preserved.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit


class URLError(ValueError):
    pass


def parse_ok(raw: str) -> bool:
    """Approximates 'Go url.Parse succeeds'. Go rejects ASCII control chars
    in the URL and malformed percent-escapes; Python's urlsplit is laxer, so
    check those explicitly."""
    if any(ord(c) < 0x20 or ord(c) == 0x7F for c in raw):
        return False
    try:
        urlsplit(raw)
    except ValueError:
        return False
    # malformed %-escape => Go url.Parse error
    i = 0
    n = len(raw)
    hexd = "0123456789abcdefABCDEF"
    while i < n:
        if raw[i] == "%":
            if i + 2 >= n or raw[i + 1] not in hexd or raw[i + 2] not in hexd:
                return False
            i += 3
        else:
            i += 1
    return True


def resolve(base: str, ref: str) -> str:
    """url.URL.ResolveReference — RFC 3986 reference resolution."""
    return urljoin(base, ref)


def host(u: str) -> str:
    """url.URL.Host: netloc with userinfo stripped, port kept, case kept."""
    netloc = urlsplit(u).netloc
    return netloc.rsplit("@", 1)[-1]


def hostname(u: str) -> str:
    """url.URL.Hostname(): host minus port; IPv6 brackets stripped; case kept."""
    h = host(u)
    if h.startswith("["):
        end = h.find("]")
        return h[1:end] if end >= 0 else h[1:]
    return h.rsplit(":", 1)[0] if ":" in h else h


def scheme(u: str) -> str:
    """url.URL.Scheme — lowercased by both Go's Parse and urlsplit."""
    return urlsplit(u).scheme


def build_full_url(short_url: str) -> str:
    """utils.go:23-33 BuildFullUrl: prepend https:// when the (case-sensitive)
    http:// / https:// prefix is absent; error when unparseable."""
    if not short_url.startswith("http://") and not short_url.startswith("https://"):
        short_url = "https://" + short_url
    if not parse_ok(short_url):
        raise URLError(f"invalid URL {short_url!r}")
    return short_url


def get_domain(input_url: str) -> str:
    """utils.go:11-20 GetDomainFromURL: Hostname() minus a leading 'www.'."""
    if not input_url.startswith("http://") and not input_url.startswith("https://"):
        input_url = "https://" + input_url
    if not parse_ok(input_url):
        raise URLError("error parsing URL")
    h = hostname(input_url)
    return h[4:] if h.startswith("www.") else h
