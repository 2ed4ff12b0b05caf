"""HTTP client for the Focoos hub API (reference: focoos/utils/api_client.py:16-247)."""

from __future__ import annotations

import os
from typing import Optional

from focoos_tpu.config import FOCOOS_CONFIG
from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class ApiClient:
    def __init__(self, api_key: Optional[str] = None, host_url: Optional[str] = None):
        self.api_key = api_key or FOCOOS_CONFIG.focoos_api_key
        self.host_url = host_url or FOCOOS_CONFIG.default_host_url
        self._headers = {
            "X-API-Key": self.api_key,
            "user_agent": "focoos-tpu/0.1.0",
        }

    def _url(self, path: str) -> str:
        return f"{self.host_url}/{path.lstrip('/')}"

    def get(self, path: str, params: Optional[dict] = None, stream: bool = False):
        import requests

        return requests.get(self._url(path), headers=self._headers, params=params, stream=stream, timeout=60)

    def post(self, path: str, data: Optional[dict] = None, files=None):
        import requests

        return requests.post(self._url(path), headers=self._headers, json=data, files=files, timeout=120)

    def patch(self, path: str, data: Optional[dict] = None):
        import requests

        return requests.patch(self._url(path), headers=self._headers, json=data, timeout=60)

    def delete(self, path: str):
        import requests

        return requests.delete(self._url(path), headers=self._headers, timeout=60)

    def upload_file(self, path: str, file_path: str, field: str = "file"):
        with open(file_path, "rb") as f:
            return self.post(path, files={field: (os.path.basename(file_path), f)})

    def download_ext_file(self, url: str, out_dir: str, file_name: Optional[str] = None, skip_if_exists: bool = True) -> str:
        """External download with progress + skip-if-exists (reference :196)."""
        import requests

        os.makedirs(out_dir, exist_ok=True)
        file_name = file_name or url.split("/")[-1].split("?")[0]
        out_path = os.path.join(out_dir, file_name)
        if skip_if_exists and os.path.isfile(out_path):
            logger.info(f"{out_path} exists, skipping download")
            return out_path
        with requests.get(url, stream=True, timeout=300) as r:
            r.raise_for_status()
            total = int(r.headers.get("content-length", 0))
            done = 0
            with open(out_path + ".part", "wb") as f:
                for chunk in r.iter_content(chunk_size=1 << 20):
                    f.write(chunk)
                    done += len(chunk)
                    if total:
                        logger.debug(f"download {done / total:.0%}")
        os.replace(out_path + ".part", out_path)
        logger.info(f"Downloaded {url} → {out_path}")
        return out_path
