// Native RLE mask ops for detectorch_tpu (CPython C API + numpy).
//
// Plays the role pycocotools' C maskApi plays for the reference
// (lib/cocoapi submodule, used via pycocotools.mask in
// result_utils.py:218-221 and json_dataset.py:397-414): run-length mask
// intersection/IoU and codec hot loops that are too slow in Python.
//
// Exposed functions (module detectorch_tpu_rle_native):
//   iou_matrix(dt_counts_list, gt_counts_list, iscrowd_list) -> (D, G) f64
//   area(counts) -> int
//   counts_to_string(counts) -> str        (maskApi rleToString semantics)
//   string_to_counts(str) -> int64 array   (maskApi rleFrString semantics)
//
// counts are 1-D int64 numpy arrays (column-major runs, zeros first).

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>
#include <string>
#include <vector>

namespace {

struct Intervals {
  // [start, end) pairs of 1-runs in flat (column-major) order
  std::vector<int64_t> starts;
  std::vector<int64_t> ends;
  int64_t area = 0;
};

bool counts_to_intervals(PyObject* obj, Intervals* out) {
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(obj, NPY_INT64, NPY_ARRAY_IN_ARRAY));
  if (!arr) return false;
  const int64_t* c = static_cast<const int64_t*>(PyArray_DATA(arr));
  npy_intp m = PyArray_SIZE(arr);
  int64_t pos = 0;
  out->starts.reserve(m / 2 + 1);
  out->ends.reserve(m / 2 + 1);
  for (npy_intp i = 0; i < m; i++) {
    if (i % 2 == 1 && c[i] > 0) {
      out->starts.push_back(pos);
      out->ends.push_back(pos + c[i]);
      out->area += c[i];
    }
    pos += c[i];
  }
  Py_DECREF(arr);
  return true;
}

int64_t intersect_area(const Intervals& a, const Intervals& b) {
  size_t i = 0, j = 0;
  int64_t total = 0;
  while (i < a.starts.size() && j < b.starts.size()) {
    int64_t lo = a.starts[i] > b.starts[j] ? a.starts[i] : b.starts[j];
    int64_t hi = a.ends[i] < b.ends[j] ? a.ends[i] : b.ends[j];
    if (hi > lo) total += hi - lo;
    if (a.ends[i] < b.ends[j]) {
      i++;
    } else {
      j++;
    }
  }
  return total;
}

PyObject* iou_matrix(PyObject*, PyObject* args) {
  PyObject *dt_list, *gt_list, *crowd_list;
  if (!PyArg_ParseTuple(args, "OOO", &dt_list, &gt_list, &crowd_list))
    return nullptr;
  Py_ssize_t d = PySequence_Size(dt_list);
  Py_ssize_t g = PySequence_Size(gt_list);
  if (d < 0 || g < 0) return nullptr;
  if (PySequence_Size(crowd_list) != g) {
    PyErr_SetString(PyExc_ValueError, "iscrowd length != #gt");
    return nullptr;
  }

  std::vector<Intervals> dts(d), gts(g);
  std::vector<char> crowd(g);
  for (Py_ssize_t i = 0; i < d; i++) {
    PyObject* o = PySequence_GetItem(dt_list, i);
    bool ok = counts_to_intervals(o, &dts[i]);
    Py_XDECREF(o);
    if (!ok) return nullptr;
  }
  for (Py_ssize_t j = 0; j < g; j++) {
    PyObject* o = PySequence_GetItem(gt_list, j);
    bool ok = counts_to_intervals(o, &gts[j]);
    Py_XDECREF(o);
    if (!ok) return nullptr;
    PyObject* c = PySequence_GetItem(crowd_list, j);
    crowd[j] = PyObject_IsTrue(c) ? 1 : 0;
    Py_XDECREF(c);
  }

  npy_intp dims[2] = {d, g};
  PyObject* out = PyArray_SimpleNew(2, dims, NPY_FLOAT64);
  if (!out) return nullptr;
  double* o = static_cast<double*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(out)));

  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < d; i++) {
    for (Py_ssize_t j = 0; j < g; j++) {
      int64_t inter = intersect_area(dts[i], gts[j]);
      double denom = crowd[j]
                         ? static_cast<double>(dts[i].area)
                         : static_cast<double>(dts[i].area + gts[j].area - inter);
      o[i * g + j] = denom > 0 ? inter / denom : 0.0;
    }
  }
  Py_END_ALLOW_THREADS
  return out;
}

PyObject* area(PyObject*, PyObject* args) {
  PyObject* counts;
  if (!PyArg_ParseTuple(args, "O", &counts)) return nullptr;
  Intervals iv;
  if (!counts_to_intervals(counts, &iv)) return nullptr;
  return PyLong_FromLongLong(iv.area);
}

PyObject* counts_to_string(PyObject*, PyObject* args) {
  // maskApi rleToString: signed 5-bit varint, 2nd-order diffs from index 3
  PyObject* obj;
  if (!PyArg_ParseTuple(args, "O", &obj)) return nullptr;
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(obj, NPY_INT64, NPY_ARRAY_IN_ARRAY));
  if (!arr) return nullptr;
  const int64_t* c = static_cast<const int64_t*>(PyArray_DATA(arr));
  npy_intp m = PyArray_SIZE(arr);
  std::string s;
  s.reserve(m * 3);
  for (npy_intp i = 0; i < m; i++) {
    int64_t x = c[i];
    if (i > 2) x -= c[i - 2];
    bool more = true;
    while (more) {
      int64_t ch = x & 0x1f;
      x >>= 5;
      more = (ch & 0x10) ? (x != -1) : (x != 0);
      if (more) ch |= 0x20;
      s.push_back(static_cast<char>(ch + 48));
    }
  }
  Py_DECREF(arr);
  return PyUnicode_FromStringAndSize(s.data(), s.size());
}

std::string runs_to_string(const std::vector<int64_t>& c) {
  // maskApi rleToString: signed 5-bit varint, 2nd-order diffs from index 3
  std::string s;
  s.reserve(c.size() * 3);
  for (size_t i = 0; i < c.size(); i++) {
    int64_t x = c[i];
    if (i > 2) x -= c[i - 2];
    bool more = true;
    while (more) {
      int64_t ch = x & 0x1f;
      x >>= 5;
      more = (ch & 0x10) ? (x != -1) : (x != 0);
      if (more) ch |= 0x20;
      s.push_back(static_cast<char>(ch + 48));
    }
  }
  return s;
}

PyObject* encode_pasted(PyObject*, PyObject* args) {
  // encode_pasted(patch_uint8 (bh, bw), x0, y0, im_h, im_w) -> ascii RLE of
  // the patch pasted into an otherwise-zero (im_h, im_w) canvas, walked in
  // column-major order without materialising the canvas (the hot loop of
  // mask pasting; reference result_utils.py:218-221 pycocotools encode).
  PyObject* patch_obj;
  long long x0, y0, im_h, im_w;
  if (!PyArg_ParseTuple(args, "OLLLL", &patch_obj, &x0, &y0, &im_h, &im_w))
    return nullptr;
  PyArrayObject* patch = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(patch_obj, NPY_UINT8, NPY_ARRAY_IN_ARRAY));
  if (!patch) return nullptr;
  if (PyArray_NDIM(patch) != 2) {
    Py_DECREF(patch);
    PyErr_SetString(PyExc_ValueError, "patch must be 2-D");
    return nullptr;
  }
  const int64_t bh = PyArray_DIM(patch, 0);
  const int64_t bw = PyArray_DIM(patch, 1);
  const uint8_t* p = static_cast<const uint8_t*>(PyArray_DATA(patch));
  std::vector<int64_t> counts;
  counts.reserve(static_cast<size_t>(bw) * 4 + 2);
  // runs alternate 0s/1s starting with a 0-run; counts.size() odd  ->
  // currently in a 0-run, even -> in a 1-run
  int64_t zero_run = x0 * im_h + y0;  // zero columns + lead-in of column 0
  for (int64_t j = 0; j < bw; j++) {
    int64_t i = 0;
    while (i < bh) {
      uint8_t v = p[i * bw + j];
      int64_t start = i;
      while (i < bh && p[i * bw + j] == v) i++;
      int64_t run = i - start;
      if (v == 0) {
        zero_run += run;
      } else if (zero_run == 0 && !counts.empty()) {
        counts.back() += run;             // contiguous across a column wrap
      } else {
        counts.push_back(zero_run);       // may be 0 (leading-1 convention)
        counts.push_back(run);
        zero_run = 0;
      }
    }
    // gap between this column's end and the next column's patch start
    zero_run += (im_h - y0 - bh) + (j + 1 < bw ? y0 : 0);
  }
  zero_run += (im_w - x0 - bw) * im_h;    // trailing zero columns
  if (zero_run > 0 || counts.empty()) counts.push_back(zero_run);
  Py_DECREF(patch);
  std::string s = runs_to_string(counts);
  return PyUnicode_FromStringAndSize(s.data(), s.size());
}

PyObject* string_to_counts(PyObject*, PyObject* args) {
  const char* s;
  Py_ssize_t len;
  if (!PyArg_ParseTuple(args, "s#", &s, &len)) return nullptr;
  std::vector<int64_t> counts;
  Py_ssize_t i = 0;
  while (i < len) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (i >= len) {
        PyErr_SetString(PyExc_ValueError, "truncated RLE string");
        return nullptr;
      }
      int64_t ch = s[i] - 48;
      x |= (ch & 0x1f) << (5 * k);
      more = (ch & 0x20) != 0;
      i++;
      if (!more && (ch & 0x10)) x |= (int64_t)(-1) << (5 * (k + 1));
      k++;
    }
    if (counts.size() > 2) x += counts[counts.size() - 2];
    counts.push_back(x);
  }
  npy_intp dims[1] = {static_cast<npy_intp>(counts.size())};
  PyObject* out = PyArray_SimpleNew(1, dims, NPY_INT64);
  if (!out) return nullptr;
  memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(out)), counts.data(),
         counts.size() * sizeof(int64_t));
  return out;
}

PyMethodDef methods[] = {
    {"iou_matrix", iou_matrix, METH_VARARGS,
     "iou_matrix(dt_counts_list, gt_counts_list, iscrowd) -> (D,G) float64"},
    {"area", area, METH_VARARGS, "area(counts) -> int"},
    {"counts_to_string", counts_to_string, METH_VARARGS,
     "counts -> COCO compressed ascii string"},
    {"encode_pasted", encode_pasted, METH_VARARGS,
     "encode_pasted(patch, x0, y0, im_h, im_w) -> ascii RLE of pasted patch"},
    {"string_to_counts", string_to_counts, METH_VARARGS,
     "COCO compressed ascii string -> int64 counts"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "detectorch_tpu_rle_native",
    "Native RLE mask ops", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_detectorch_tpu_rle_native(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
