// React SPA for the qwen-edit-tpu server — functional parity with the
// upstream project's frontend (webcam / upload / composite tabs, client-side
// 512² center crop, steps 2-8, CFG toggle, blend ratio) against the same
// /edit JSON contract. Original implementation, hooks-based.
import React, { useCallback, useRef, useState } from "react";
import Webcam from "react-webcam";

const API_URL = process.env.REACT_APP_API_URL || "http://localhost:8086";

// Center-crop any image source to a size×size JPEG data URL.
function cropToSquare(source, srcW, srcH, size = 512) {
  const canvas = document.createElement("canvas");
  canvas.width = size;
  canvas.height = size;
  const s = Math.min(srcW, srcH);
  canvas
    .getContext("2d")
    .drawImage(source, (srcW - s) / 2, (srcH - s) / 2, s, s, 0, 0, size, size);
  return canvas.toDataURL("image/jpeg", 0.9);
}

function fileToDataUrl(file) {
  return new Promise((resolve, reject) => {
    const img = new Image();
    img.onload = () => resolve(cropToSquare(img, img.width, img.height));
    img.onerror = reject;
    img.src = URL.createObjectURL(file);
  });
}

const styles = {
  page: { fontFamily: "system-ui", maxWidth: 1100, margin: "2em auto" },
  row: { display: "flex", gap: "1em", flexWrap: "wrap" },
  col: { flex: 1, minWidth: 340 },
  media: { width: "100%", maxWidth: 512, borderRadius: 8, border: "1px solid #ccc" },
  tab: (on) => ({
    padding: "0.5em 1.2em",
    marginRight: 8,
    borderRadius: 6,
    border: "1px solid #888",
    background: on ? "#334" : "#fff",
    color: on ? "#fff" : "#222",
    cursor: "pointer",
  }),
  button: {
    padding: "0.6em 1.6em",
    borderRadius: 6,
    border: "1px solid #466",
    background: "#467",
    color: "#fff",
    cursor: "pointer",
    marginTop: 8,
  },
};

export default function App() {
  const webcamRef = useRef(null);
  const [tab, setTab] = useState("webcam");
  const [prompt, setPrompt] = useState("Transform into oil painting style");
  const [steps, setSteps] = useState(2);
  const [useCfg, setUseCfg] = useState(false);
  const [blend, setBlend] = useState(0.5);
  const [uploadData, setUploadData] = useState(null);
  const [refData, setRefData] = useState(null);
  const [result, setResult] = useState(null);
  const [status, setStatus] = useState("idle");
  const [busy, setBusy] = useState(false);

  const submit = useCallback(
    async (imageDataUrl) => {
      if (!imageDataUrl) {
        setStatus("no input image");
        return;
      }
      setBusy(true);
      setStatus("processing…");
      const body = {
        image: imageDataUrl,
        prompt,
        steps,
        use_cfg: useCfg,
      };
      if (tab === "composite" && refData) {
        body.ref_image = refData;
        body.blend_ratio = blend;
      }
      try {
        const t0 = performance.now();
        const resp = await fetch(`${API_URL}/edit`, {
          method: "POST",
          headers: { "Content-Type": "application/json" },
          body: JSON.stringify(body),
        });
        const json = await resp.json();
        if (!resp.ok) {
          setStatus(`error ${resp.status}: ${json.detail || "unknown"}`);
        } else {
          setResult(`data:image/jpeg;base64,${json.image}`);
          const rt = ((performance.now() - t0) / 1000).toFixed(2);
          setStatus(`done in ${json.elapsed.toFixed(2)}s (round trip ${rt}s)`);
        }
      } catch (e) {
        setStatus(`request failed: ${e}`);
      } finally {
        setBusy(false);
      }
    },
    [prompt, steps, useCfg, tab, refData, blend]
  );

  const onEdit = useCallback(() => {
    if (busy) return;
    if (tab === "webcam") {
      const video = webcamRef.current && webcamRef.current.video;
      if (!video || !video.videoWidth) {
        setStatus("webcam not ready");
        return;
      }
      submit(cropToSquare(video, video.videoWidth, video.videoHeight));
    } else {
      submit(uploadData);
    }
  }, [busy, tab, uploadData, submit]);

  return (
    <div style={styles.page}>
      <h2>Qwen-Image-Edit-2509 — TPU realtime editing</h2>
      <div>
        {["webcam", "upload", "composite"].map((t) => (
          <button key={t} style={styles.tab(tab === t)} onClick={() => setTab(t)}>
            {t[0].toUpperCase() + t.slice(1)}
          </button>
        ))}
      </div>
      <div style={styles.row}>
        <div style={styles.col}>
          {tab === "webcam" ? (
            <Webcam ref={webcamRef} audio={false} style={styles.media} />
          ) : (
            <div>
              <input
                type="file"
                accept="image/*"
                onChange={async (e) =>
                  e.target.files[0] &&
                  setUploadData(await fileToDataUrl(e.target.files[0]))
                }
              />
              {uploadData && (
                <img src={uploadData} alt="input" style={styles.media} />
              )}
            </div>
          )}
          {tab === "composite" && (
            <div>
              <label>
                Reference image:{" "}
                <input
                  type="file"
                  accept="image/*"
                  onChange={async (e) =>
                    e.target.files[0] &&
                    setRefData(await fileToDataUrl(e.target.files[0]))
                  }
                />
              </label>
              <label style={{ display: "block" }}>
                Blend: {blend.toFixed(2)}
                <input
                  type="range"
                  min="0"
                  max="1"
                  step="0.05"
                  value={blend}
                  onChange={(e) => setBlend(Number(e.target.value))}
                />
              </label>
            </div>
          )}
          <textarea
            style={{ width: "100%", minHeight: "3em", marginTop: 8 }}
            value={prompt}
            onChange={(e) => setPrompt(e.target.value)}
          />
          <label style={{ display: "block" }}>
            Steps: {steps}
            <input
              type="range"
              min="2"
              max="8"
              step="1"
              value={steps}
              onChange={(e) => setSteps(Number(e.target.value))}
            />
          </label>
          <label style={{ display: "block" }}>
            <input
              type="checkbox"
              checked={useCfg}
              onChange={(e) => setUseCfg(e.target.checked)}
            />{" "}
            CFG (higher quality, ~1.5× slower)
          </label>
          <button style={styles.button} onClick={onEdit} disabled={busy}>
            {busy ? "Processing…" : "Edit"}
          </button>
          <div style={{ color: "#666", marginTop: 8 }}>{status}</div>
        </div>
        <div style={styles.col}>
          {result ? (
            <img src={result} alt="result" style={styles.media} />
          ) : (
            <div style={{ ...styles.media, padding: "4em 0", textAlign: "center", color: "#999" }}>
              result appears here
            </div>
          )}
        </div>
      </div>
    </div>
  );
}
