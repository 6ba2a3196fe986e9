// Shared-memory key-value store: the native IPC/result-transport backend
// standing in for the reference deployment's Redis service
// (reference: common/cache.py + docker-compose.yml redis).
//
// Design: one POSIX shared-memory segment per named cache, laid out as
//   [Header | bucket table | arena]
// Open-addressed hash table; values are arena-allocated blocks with a
// simple bump allocator + freelist-by-generation compaction. A
// process-shared pthread mutex serializes writers; readers copy under
// the same lock (values are small pickled frames, lock hold times are
// microseconds). Entries carry millisecond-resolution expiry.
//
// Exposed as a flat C ABI consumed from Python via ctypes (no pybind11
// in this environment).

#include <algorithm>
#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>
#include <fcntl.h>
#include <pthread.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

constexpr uint64_t MAGIC = 0x52454948434E4143ull;  // "REIHCNAC"
constexpr uint32_t MAX_KEY = 256;
// Deleted-entry marker: keeps open-addressing probe chains intact
// (resetting to 0 would make colliding keys past the hole unreachable).
constexpr uint64_t TOMB = ~0ull;

struct Header {
    uint64_t magic;
    uint64_t capacity;        // total segment size
    uint64_t nbuckets;
    uint64_t arena_off;       // start of value arena
    std::atomic<uint64_t> arena_used;
    pthread_mutex_t lock;
};

struct Bucket {
    uint64_t key_hash;        // 0 = empty
    uint64_t expires_ms;      // 0 = no expiry
    uint64_t value_off;       // offset into segment
    uint32_t value_len;
    uint32_t key_len;
    char key[MAX_KEY];
};

uint64_t now_ms() {
    timespec ts;
    clock_gettime(CLOCK_REALTIME, &ts);
    return uint64_t(ts.tv_sec) * 1000 + ts.tv_nsec / 1000000;
}

uint64_t fnv1a(const char* data, size_t len) {
    uint64_t h = 1469598103934665603ull;
    for (size_t i = 0; i < len; i++) {
        h ^= (unsigned char)data[i];
        h *= 1099511628211ull;
    }
    if (h == 0 || h == TOMB) return 1;  // 0 = empty, TOMB = deleted
    return h;
}

struct Cache {
    void* base;
    Header* hdr;
    Bucket* buckets;
    char* arena;
};

Bucket* find_bucket(Cache* c, const char* key, uint32_t klen, bool for_insert) {
    uint64_t h = fnv1a(key, klen);
    uint64_t n = c->hdr->nbuckets;
    Bucket* first_free = nullptr;
    for (uint64_t probe = 0; probe < n; probe++) {
        Bucket* b = &c->buckets[(h + probe) % n];
        if (b->key_hash == 0) {
            if (for_insert) return first_free ? first_free : b;
            return nullptr;
        }
        if (b->key_hash == TOMB) {  // deleted: reusable, keep probing
            if (for_insert && !first_free) first_free = b;
            continue;
        }
        if (b->key_hash == h && b->key_len == klen &&
            memcmp(b->key, key, klen) == 0) {
            return b;
        }
        // expired entries are reusable on insert
        if (for_insert && !first_free && b->expires_ms &&
            b->expires_ms < now_ms()) {
            first_free = b;
        }
    }
    return for_insert ? first_free : nullptr;
}

// Compact the arena by dropping expired entries and repacking live
// values, and rebuild the bucket table (clearing tombstones).
void compact(Cache* c) {
    uint64_t n = c->hdr->nbuckets;
    uint64_t ms = now_ms();
    std::vector<Bucket> live;
    for (uint64_t i = 0; i < n; i++) {
        Bucket* b = &c->buckets[i];
        if (b->key_hash != 0 && b->key_hash != TOMB &&
            !(b->expires_ms && b->expires_ms < ms)) {
            live.push_back(*b);
        }
        b->key_hash = 0;
    }
    // Repack in ascending offset order: iterating in bucket order could
    // memmove a value DOWN onto a lower-offset live value that has not
    // been moved yet, corrupting it.
    std::sort(live.begin(), live.end(),
              [](const Bucket& a, const Bucket& b) {
                  return a.value_off < b.value_off;
              });
    uint64_t write = 0;
    for (Bucket& b : live) {
        if (b.value_off != c->hdr->arena_off + write) {
            memmove(c->arena + write, (char*)c->base + b.value_off,
                    b.value_len);
            b.value_off = c->hdr->arena_off + write;
        }
        write += (b.value_len + 7) & ~7ull;
    }
    c->hdr->arena_used.store(write);
    // reinsert into the cleared table (live.size() ≤ nbuckets by
    // construction, so a slot always exists)
    for (const Bucket& b : live) {
        Bucket* slot = find_bucket(c, b.key, b.key_len, /*for_insert=*/true);
        *slot = b;
    }
}

}  // namespace

extern "C" {

void* shmcache_open(const char* name, uint64_t capacity) {
    char path[300];
    snprintf(path, sizeof path, "/%s", name);
    bool created = false;
    int fd = shm_open(path, O_RDWR, 0600);
    if (fd < 0) {
        fd = shm_open(path, O_RDWR | O_CREAT | O_EXCL, 0600);
        if (fd < 0) {
            fd = shm_open(path, O_RDWR, 0600);  // lost the race: reopen
        } else {
            created = true;
        }
    }
    if (fd < 0) return nullptr;
    if (created && ftruncate(fd, (off_t)capacity) != 0) {
        close(fd);
        shm_unlink(path);
        return nullptr;
    }
    struct stat st;
    fstat(fd, &st);
    uint64_t size = created ? capacity : (uint64_t)st.st_size;
    void* base = mmap(nullptr, size, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
    close(fd);
    if (base == MAP_FAILED) return nullptr;

    Cache* c = new Cache;
    c->base = base;
    c->hdr = (Header*)base;
    if (created) {
        // Bucket table gets ≤ 1/4 of the segment, the rest is value arena.
        uint64_t nbuckets = (size / 4) / sizeof(Bucket);
        if (nbuckets < 16) nbuckets = 16;
        if (nbuckets > 65536) nbuckets = 65536;
        c->hdr->magic = MAGIC;
        c->hdr->capacity = size;
        c->hdr->nbuckets = nbuckets;
        c->hdr->arena_off =
            (sizeof(Header) + nbuckets * sizeof(Bucket) + 63) & ~63ull;
        c->hdr->arena_used.store(0);
        pthread_mutexattr_t attr;
        pthread_mutexattr_init(&attr);
        pthread_mutexattr_setpshared(&attr, PTHREAD_PROCESS_SHARED);
        pthread_mutexattr_setrobust(&attr, PTHREAD_MUTEX_ROBUST);
        pthread_mutex_init(&c->hdr->lock, &attr);
        memset((char*)base + sizeof(Header), 0, nbuckets * sizeof(Bucket));
    } else if (c->hdr->magic != MAGIC) {
        munmap(base, size);
        delete c;
        return nullptr;
    }
    c->buckets = (Bucket*)((char*)base + sizeof(Header));
    c->arena = (char*)base + c->hdr->arena_off;
    return c;
}

static int lock_robust(Cache* c) {
    int rc = pthread_mutex_lock(&c->hdr->lock);
    if (rc == EOWNERDEAD) {
        pthread_mutex_consistent(&c->hdr->lock);
        rc = 0;
    }
    return rc;
}

int shmcache_set(void* handle, const char* key, uint32_t klen,
                 const char* value, uint32_t vlen, double ttl_s) {
    Cache* c = (Cache*)handle;
    if (klen > MAX_KEY) return -1;
    if (lock_robust(c) != 0) return -2;

    uint64_t aligned = (vlen + 7) & ~7ull;
    uint64_t arena_cap = c->hdr->capacity - c->hdr->arena_off;
    if (c->hdr->arena_used.load() + aligned > arena_cap) {
        compact(c);
        if (c->hdr->arena_used.load() + aligned > arena_cap) {
            pthread_mutex_unlock(&c->hdr->lock);
            return -3;  // out of space even after compaction
        }
    }
    Bucket* b = find_bucket(c, key, klen, /*for_insert=*/true);
    if (!b) {
        pthread_mutex_unlock(&c->hdr->lock);
        return -4;  // table full
    }
    uint64_t off = c->hdr->arena_used.fetch_add(aligned);
    memcpy(c->arena + off, value, vlen);
    b->key_hash = fnv1a(key, klen);
    b->key_len = klen;
    memcpy(b->key, key, klen);
    b->value_off = c->hdr->arena_off + off;
    b->value_len = vlen;
    b->expires_ms = ttl_s > 0 ? now_ms() + (uint64_t)(ttl_s * 1000) : 0;
    pthread_mutex_unlock(&c->hdr->lock);
    return 0;
}

// Returns the value length (copied into ``out``), 0 if missing/expired,
// or the negated required size if ``out_cap`` is too small.
int64_t shmcache_get(void* handle, const char* key, uint32_t klen,
                     char* out, uint64_t out_cap) {
    Cache* c = (Cache*)handle;
    if (lock_robust(c) != 0) return 0;
    Bucket* b = find_bucket(c, key, klen, /*for_insert=*/false);
    int64_t ret = 0;
    if (b) {
        if (b->expires_ms && b->expires_ms < now_ms()) {
            b->key_hash = TOMB;
        } else if (b->value_len <= out_cap) {
            memcpy(out, (char*)c->base + b->value_off, b->value_len);
            ret = b->value_len;
        } else {
            ret = -(int64_t)b->value_len;
        }
    }
    pthread_mutex_unlock(&c->hdr->lock);
    return ret;
}

int shmcache_delete(void* handle, const char* key, uint32_t klen) {
    Cache* c = (Cache*)handle;
    if (lock_robust(c) != 0) return -2;
    Bucket* b = find_bucket(c, key, klen, /*for_insert=*/false);
    if (b) b->key_hash = TOMB;
    pthread_mutex_unlock(&c->hdr->lock);
    return b ? 0 : -1;
}

void shmcache_close(void* handle) {
    Cache* c = (Cache*)handle;
    munmap(c->base, c->hdr->capacity);
    delete c;
}

int shmcache_unlink(const char* name) {
    char path[300];
    snprintf(path, sizeof path, "/%s", name);
    return shm_unlink(path);
}

}  // extern "C"
