"""Build dist/engine.zip for spark-submit --py-files.

Deterministic: sorted entries, fixed timestamps — the zip's bytes depend
only on the source contents, so rebuilds do not churn the binary in git;
the write is skipped entirely when the content is unchanged."""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_bytes() -> bytes:
    import io

    buf = io.BytesIO()
    paths = []
    for root, _dirs, files in os.walk(os.path.join(REPO, "ivfadc_spark")):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                paths.append((os.path.relpath(p, REPO), p))
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for rel, p in sorted(paths):
            zi = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zi.external_attr = 0o644 << 16
            with open(p, "rb") as fh:
                z.writestr(zi, fh.read())
    return buf.getvalue()


def main() -> None:
    os.makedirs(os.path.join(REPO, "dist"), exist_ok=True)
    out = os.path.join(REPO, "dist", "engine.zip")
    data = build_bytes()
    if os.path.exists(out):
        with open(out, "rb") as f:
            if f.read() == data:
                print(out + " (unchanged)")
                return
    with open(out, "wb") as f:
        f.write(data)
    print(out)


if __name__ == "__main__":
    main()
