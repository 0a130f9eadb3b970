// Native batch-conversion client: the reference host converter's role
// (software/main.c:206-247 directory walk + main.c:100-165 per-file device
// conversation), retargeted at the TCP FeatureServer instead of the FT601
// USB3 link.
//
// Per file, mirroring main.c's protocol:
//   * soft reset before the first file's samples (main.c:21-34
//     mfcc_softreset), then all samples as 32-bit words, int16 in the low
//     half (main.c:128-151), then the NEXT stream boundary immediately: a
//     lone reset word (or write-side shutdown after the last file) so the
//     server flushes the file's residual run right away;
//   * read exactly n_frames = (len - nfft)/hop + 1 magic-framed feature
//     columns back and write them to <name>.mfcc (main.c:154-165).
//
// The boundary marker must be sent BEFORE waiting for the file's frames:
// the server emits a file's final partial-chunk frames only once the next
// reset (or EOF) bounds the run.
//
// Usage: mfcc_client <host> <port> <wavdir> [ncep]

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <filesystem>
#include <string>
#include <vector>

extern "C" {
int mfcc_wav_read(const char *path, int16_t **out, int64_t *n_samples,
                  int32_t *sample_rate);
void mfcc_free(void *p);
int64_t mfcc_encode_stream_words(const int16_t *samples, int64_t n,
                                 int reset_first, uint32_t *out);
int64_t mfcc_decode_frames(const uint8_t *buf, int64_t n, int32_t ncep,
                           int16_t *cep, int64_t max_frames,
                           int64_t *consumed);
}

namespace fs = std::filesystem;

static const int NFFT = 512;
static const int HOP = NFFT / 3;  // 170 (mfcc/core/mfcc.py:43)

static int send_all(int fd, const void *buf, size_t n) {
  const uint8_t *p = (const uint8_t *)buf;
  while (n) {
    ssize_t w = send(fd, p, n, 0);
    if (w <= 0) return -1;
    p += w;
    n -= (size_t)w;
  }
  return 0;
}

// Read framed columns until `want` frames are decoded; leftover bytes stay
// in `carry` for the next file (frames never split across files, but TCP
// reads can split frames).
static int read_frames(int fd, int ncep, int64_t want,
                       std::vector<int16_t> &out, std::vector<uint8_t> &carry) {
  out.assign((size_t)want * ncep, 0);
  int64_t got = 0;
  std::vector<int16_t> cols((size_t)want * ncep);
  for (;;) {
    if (!carry.empty()) {
      int64_t consumed = 0;
      int64_t n = mfcc_decode_frames(carry.data(), (int64_t)carry.size(),
                                     ncep, cols.data(), want - got,
                                     &consumed);
      memcpy(out.data() + got * ncep, cols.data(),
             sizeof(int16_t) * (size_t)n * ncep);
      got += n;
      carry.erase(carry.begin(), carry.begin() + consumed);
      if (got >= want) return 0;
    }
    uint8_t buf[65536];
    ssize_t r = recv(fd, buf, sizeof buf, 0);
    if (r <= 0) return -1;  // EOF/err before all frames arrived
    carry.insert(carry.end(), buf, buf + r);
  }
}

int main(int argc, char **argv) {
  if (argc < 4 || argc > 5) {
    fprintf(stderr, "usage: %s <host> <port> <wavdir> [ncep=32]\n", argv[0]);
    return 2;
  }
  const char *host = argv[1];
  const char *port = argv[2];
  const fs::path root = argv[3];
  const int ncep = argc > 4 ? atoi(argv[4]) : 32;

  std::vector<fs::path> wavs;
  for (auto &e : fs::recursive_directory_iterator(root)) {
    if (!e.is_regular_file()) continue;
    std::string ext = e.path().extension().string();
    std::transform(ext.begin(), ext.end(), ext.begin(), ::tolower);
    if (ext == ".wav") wavs.push_back(e.path());
  }
  std::sort(wavs.begin(), wavs.end());
  if (wavs.empty()) {
    fprintf(stderr, "no wav files under %s\n", root.c_str());
    return 1;
  }

  struct addrinfo hints = {}, *res = nullptr;
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  if (getaddrinfo(host, port, &hints, &res) != 0 || !res) {
    fprintf(stderr, "cannot resolve %s:%s\n", host, port);
    return 1;
  }
  int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd < 0 || connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
    fprintf(stderr, "cannot connect to %s:%s\n", host, port);
    freeaddrinfo(res);
    return 1;
  }
  freeaddrinfo(res);

  std::vector<uint8_t> carry;
  int rc = 0;
  for (size_t i = 0; i < wavs.size(); i++) {
    int16_t *samples = nullptr;
    int64_t n = 0;
    int32_t rate = 0;
    if (mfcc_wav_read(wavs[i].c_str(), &samples, &n, &rate) != 0) {
      fprintf(stderr, "skip (bad wav): %s\n", wavs[i].c_str());
      continue;
    }
    std::vector<uint32_t> words((size_t)n + 2);
    int64_t nw = mfcc_encode_stream_words(samples, n,
                                          /*reset_first=*/i == 0,
                                          words.data());
    mfcc_free(samples);
    if (i + 1 < wavs.size())
      words[(size_t)nw++] = 0x80000000u;  // boundary: flush + next stream
    // little-endian wire order (the server reads "<u4")
    if (send_all(fd, words.data(), sizeof(uint32_t) * (size_t)nw) != 0) {
      fprintf(stderr, "send failed on %s\n", wavs[i].c_str());
      rc = 1;
      break;
    }
    if (i + 1 == wavs.size()) shutdown(fd, SHUT_WR);  // flush the last file

    int64_t want = n >= NFFT ? (n - NFFT) / HOP + 1 : 0;
    std::vector<int16_t> cep;
    // want == 0 (wav shorter than one frame): the server emits nothing for
    // this stream, and blocking in recv() here would deadlock -- the next
    // file's frames can't arrive before we send its samples.
    if (want > 0 && read_frames(fd, ncep, want, cep, carry) != 0) {
      fprintf(stderr, "short read on %s\n", wavs[i].c_str());
      rc = 1;
      break;
    }
    fs::path out = wavs[i];
    out.replace_extension(".mfcc");
    FILE *f = fopen(out.c_str(), "wb");
    if (!f) {
      fprintf(stderr, "cannot write %s\n", out.c_str());
      rc = 1;
      break;
    }
    fwrite(cep.data(), sizeof(int16_t), cep.size(), f);
    fclose(f);
    printf("%s -> %s (%lld frames)\n", wavs[i].c_str(), out.c_str(),
           (long long)want);
  }
  close(fd);
  return rc;
}
